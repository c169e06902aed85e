import time, numpy as np, jax, jax.numpy as jnp
from cineform_tpu.entropy import device_decode as dd
import sys

T = int(sys.argv[1])
which = sys.argv[2:]
rng = np.random.default_rng(0)
NOUT = T * 16
payload = jnp.zeros(T*4, jnp.uint8)
packed2d = jnp.zeros((T,32), jnp.int32)
reset = jnp.zeros(T, bool)
i32 = jnp.zeros(T, jnp.int32)
u32_27 = jnp.zeros((T,27), jnp.uint32)
i32_27 = jnp.zeros((T,27), jnp.int32)
u32 = jnp.zeros(T, jnp.uint32)
ct = jnp.zeros((T,12), jnp.int32); cv = jnp.zeros((T,12), jnp.uint32)
tg = jnp.zeros(T*12, jnp.int32); vl = jnp.zeros(T*12, jnp.uint32)

stages = {
  "classify": (dd.classify, (payload,)),
  "transfers": (dd.chunk_transfers, (packed2d,)),
  "scan": (dd.scan_entries, (u32_27, u32, i32_27, reset)),
  "walk": (dd.final_walk, (packed2d, i32)),
  "emit": (dd.emit_slots, (packed2d, jnp.zeros((T,32), jnp.uint32), i32, i32, i32, i32, i32)),
  "compact": (dd.compact_slots, (ct, cv, i32)),
  "spread": (lambda a,b: dd.spread_slots(a,b,NOUT), (tg, vl)),
}
for name in (which or stages):
    f, args = stages[name]
    t0 = time.perf_counter()
    jax.jit(f).lower(*args).compile()
    print(f"T={T} {name:12s} compile {time.perf_counter()-t0:7.1f} s", flush=True)
