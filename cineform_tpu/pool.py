"""Asynchronous encoder pool: submit-N frames / harvest in order.

Behavioral contract: `EncoderSDK/EncoderPool.cpp:59-449` — N worker encoders
fed from a bounded job queue, per-frame metadata snapshots, and strictly
in-submission-order delivery through WaitForSample/TestForSample.

TPU re-expression of the reference's frame-level thread parallelism
(SURVEY §2.4): for device-capable configurations (YUY2/UYVY/v210/YU64
4:2:2, intra or 2-frame GOP), a batcher thread drains the submission
queue and encodes whole batches on the chip in one traced XLA program
(`IntraCodec.forward_packed`: unpack + DWT + quant + entropy coding in
HBM), the host writing only headers.  Other input formats run on the
host thread pool through per-worker `api.Encoder`s, one frame per job,
like the reference's CAsyncEncoder workers.
"""

from __future__ import annotations

import threading
from collections import deque
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass

import numpy as np

from cineform_tpu import api


@dataclass
class SampleBuffer:
    """CFHD_SampleBufferRef equivalent (`EncoderSDK/VideoBuffers.h`)."""

    frame_number: int
    data: bytes

    def get_encoded_sample(self) -> bytes:  # CFHD_GetEncodedSample
        return self.data


_DEVICE_POOL_FORMATS = {
    api.PixelFormat.YUY2: "YUY2", api.PixelFormat.UYVY: "UYVY",
    api.PixelFormat.V210: "V210", api.PixelFormat.YU64: "YU64",
    # RGB 4:4:4 / RGBA 4:4:4:4 / Bayer device encode (round 4): the same
    # batcher runs the 12-bit configs through IntraCodec's device unpack
    # kernels (`Codec/frame.c:4993/5473/5968/6569` on the chip)
    api.PixelFormat.RG48: "RG48", api.PixelFormat.B64A: "B64A",
    api.PixelFormat.RG64: "RG64", api.PixelFormat.BYR4: "BYR4",
    api.PixelFormat.BYR5: "BYR5",
}


class EncoderPool:
    """CFHD_CreateEncoderPool .. CFHD_ReleaseEncoderPool."""

    #: frames gathered per device batch (one traced XLA program)
    DEVICE_BATCH = 8

    def __init__(self, thread_count: int, job_queue_length: int) -> None:
        if thread_count < 1 or job_queue_length < 1:
            raise api.CFHDError(api.ErrorCode.INVALID_ARGUMENT)
        self.thread_count = thread_count
        self.queue_length = job_queue_length
        self._executor: ThreadPoolExecutor | None = None
        self._pending: deque[tuple[int, Future]] = deque()
        self._in_flight = 0
        self._lock = threading.Condition()
        self._prepared = False
        self._metadata = None
        self._tls = threading.local()
        self._device_codec = None
        self._batch_queue: deque = deque()
        self._batcher: threading.Thread | None = None
        self._stopping = False
        self._gop_parity = 0

    # CFHD_GetAsyncInputFormats
    def get_input_formats(self) -> tuple[api.PixelFormat, ...]:
        return api.Encoder.INPUT_FORMATS

    # CFHD_PrepareEncoderPool
    def prepare_to_encode(self, width: int, height: int,
                          pixel_format: api.PixelFormat,
                          encoded_format=api.EncodedFormat.YUV_422,
                          encoding_flags=api.EncodingFlags.NONE,
                          quality=api.EncodingQuality.FILMSCAN1,
                          use_device: bool | None = None) -> None:
        probe = api.Encoder()  # validates arguments
        probe.prepare_to_encode(width, height, pixel_format, encoded_format,
                                encoding_flags, quality)
        self.gop = bool(encoding_flags & api.EncodingFlags.YUV_2FRAME_GOP)
        if encoding_flags & api.EncodingFlags.YUV_INTERLACED:
            raise api.CFHDError(api.ErrorCode.BADFORMAT,
                                "interlaced GOP is not supported in the pool")
        device_fmt = _DEVICE_POOL_FORMATS.get(pixel_format)
        if device_fmt == "V210" and width % 48:
            device_fmt = None              # ragged v210 tail: host path
        if use_device is None:
            use_device = device_fmt is not None
        if use_device and device_fmt is None:
            raise api.CFHDError(api.ErrorCode.BADFORMAT,
                                f"no device path for {pixel_format!r}")
        if self.gop and not (use_device and pixel_format
                             == api.PixelFormat.YUY2):
            # GOP pairing is stateful across submissions; the host worker
            # pool encodes each job independently.  The device batcher
            # pairs consecutive submissions deterministically.
            raise api.CFHDError(api.ErrorCode.BADFORMAT,
                                "2-frame GOP needs the device path (YUY2)")
        self.width, self.height = width, height
        self.quality = probe.quality
        self.pixel_format = pixel_format
        self.encoded_format = encoded_format
        self.use_device = use_device
        if use_device and not self.gop:
            from cineform_tpu.models.intra import IntraCodec
            self._device_codec = IntraCodec(
                width=width, height=height, quality=int(self.quality),
                input_format=device_fmt)
            # multi-chip: shard the batch's frame axis across the mesh —
            # jit compiles the same encode program SPMD over ICI
            # (pure data parallel, SURVEY §2.4); the dryrun validates
            # bit-identity vs unsharded
            import jax
            ndev = len(jax.devices())
            if ndev > 1:
                from cineform_tpu.parallel.mesh import (batch_sharding,
                                                        frame_mesh)
                mesh = frame_mesh(min(ndev, self.DEVICE_BATCH))
                self._sharding = batch_sharding(mesh)
            else:
                self._sharding = None
        elif use_device:
            from cineform_tpu.models.gop import GopCodec
            self._device_codec = GopCodec(width=width, height=height,
                                          quality=int(self.quality))
        self._prepared = True

    # CFHD_AttachEncoderPoolMetadata
    def attach_metadata(self, metadata) -> None:
        self._metadata = metadata

    # CFHD_StartEncoderPool
    def start(self) -> None:
        if not self._prepared:
            raise api.CFHDError(api.ErrorCode.ENCODING_NOT_STARTED)
        if self.use_device:
            if self._batcher is None:
                self._stopping = False
                self._batcher = threading.Thread(
                    target=self._batch_loop, name="cfhd-device-batcher",
                    daemon=True)
                self._batcher.start()
        elif self._executor is None:
            self._executor = ThreadPoolExecutor(
                max_workers=self.thread_count,
                thread_name_prefix="cfhd-encoder")

    # CFHD_StopEncoderPool
    def stop(self) -> None:
        if self._executor is not None:
            self._executor.shutdown(wait=True)
            self._executor = None
        if self._batcher is not None:
            with self._lock:
                self._stopping = True
                self._lock.notify_all()
            self._batcher.join()
            self._batcher = None

    # --- device batch path --------------------------------------------------

    def _batch_loop(self) -> None:
        """Drain submissions and encode whole batches on the chip.

        Batches are padded to DEVICE_BATCH so one traced program serves
        every batch size; only the real frames are assembled on the host."""
        codec = self._device_codec
        while True:
            with self._lock:
                while not self._batch_queue and not self._stopping:
                    self._lock.wait()
                if not self._batch_queue and self._stopping:
                    return
                jobs = [self._batch_queue.popleft()
                        for _ in range(min(len(self._batch_queue),
                                           self.DEVICE_BATCH))]
            try:
                real = len(jobs)
                pad = self.DEVICE_BATCH - real
                if self.gop:
                    f0 = np.stack([j[1] for j in jobs]
                                  + [jobs[-1][1]] * pad)
                    f1 = np.stack([j[2] for j in jobs]
                                  + [jobs[-1][2]] * pad)
                    samples = codec.encode_batch(
                        f0, f1,
                        frame_numbers=[j[0] for j in jobs]
                        + [0] * pad,
                        metadata=[j[3] for j in jobs] + [None] * pad,
                        assemble_count=real)
                else:
                    frames = np.stack([j[1] for j in jobs]
                                      + [jobs[-1][1]] * pad)
                    samples = codec.encode_batch_device(
                        frames,
                        frame_numbers=[j[0] for j in jobs] + [0] * pad,
                        metadata=[j[2] for j in jobs] + [None] * pad,
                        assemble_count=real,
                        sharding=getattr(self, "_sharding", None))
                for j, s in zip(jobs, samples):
                    j[-1].set_result(s)
            except BaseException as exc:  # propagate to the harvesters
                for j in jobs:
                    if not j[-1].done():
                        j[-1].set_exception(exc)

    def _worker_encoder(self) -> api.Encoder:
        """Per-worker-thread sample encoder, mirroring the reference's
        CAsyncEncoder-owns-a-CSampleEncoder design (`AsyncEncoder.h:30-41`).
        Dispatching through api.Encoder gives every advertised input format
        the same per-format encode path as the synchronous API."""
        enc = getattr(self._tls, "encoder", None)
        if enc is None:
            enc = api.Encoder()
            enc.prepare_to_encode(self.width, self.height, self.pixel_format,
                                  self.encoded_format, api.EncodingFlags.NONE,
                                  self.quality)
            self._tls.encoder = enc
        return enc

    def _encode_job(self, frame_number: int, frame: bytes, metadata) -> bytes:
        enc = self._worker_encoder()
        # per-frame metadata snapshot + explicit frame numbering
        # (`EncoderPool.cpp:389-449`)
        enc._metadata = metadata
        enc._frame_number = frame_number - 1
        enc.encode_sample(frame)
        return enc.get_sample_data()

    # CFHD_EncodeAsyncSample
    def encode_async_sample(self, frame_number: int,
                            frame: bytes | np.ndarray,
                            metadata=None) -> None:
        if self._executor is None and self._batcher is None:
            raise api.CFHDError(api.ErrorCode.ENCODING_NOT_STARTED)
        # The queue bound limits jobs in flight (unfinished encodes), not
        # unharvested results — finished samples wait in the output queue
        # (`EncoderSDK/EncoderQueue.h:45-51` job states).
        with self._lock:
            while self._in_flight >= self.queue_length:
                self._lock.wait()
            self._in_flight += 1
        if self.use_device:
            buf = (np.frombuffer(frame, dtype=np.uint8)
                   if isinstance(frame, (bytes, bytearray))
                   else np.ascontiguousarray(frame).view(np.uint8).reshape(-1))
            rb = self._device_codec.row_bytes if not self.gop \
                else 2 * self.width
            if buf.size != self.height * rb:
                with self._lock:
                    self._in_flight -= 1
                    self._lock.notify_all()
                raise api.CFHDError(api.ErrorCode.INVALID_ARGUMENT,
                                    "bad frame size")
            arr = buf.reshape(self.height, rb)
            fut = Future()
            fut.add_done_callback(self._job_done)
            meta = metadata or self._metadata
            with self._lock:
                if self.gop:
                    if self._gop_parity == 0:
                        # first of the pair: deliver the tiny header
                        # sample immediately (sync Encoder parity) — the
                        # sequence header for the stream's first group,
                        # a SAMPLE_TYPE_FRAME header for every later one
                        # (`EncodeFirstSample` runs once, encoder.c:3226)
                        from cineform_tpu.models import gop_host
                        self._gop_first = arr
                        self._gop_parity = 1
                        ngroups = getattr(self, "_gop_group", 0)
                        if ngroups == 0:
                            fut.set_result(gop_host.sequence_header(
                                self.width, self.height))
                        else:
                            fut.set_result(gop_host.frame_header_sample(
                                self.width, self.height, 2 * ngroups - 1))
                    else:
                        self._gop_parity = 0
                        self._gop_group = getattr(self, "_gop_group", 0) + 1
                        # the group's FRAME_NUMBER is the display number
                        # of its first frame (1, 3, 5, ...)
                        self._batch_queue.append(
                            (2 * self._gop_group - 1, self._gop_first, arr,
                             meta, fut))
                else:
                    self._batch_queue.append((frame_number, arr, meta, fut))
                self._pending.append((frame_number, fut))
                self._lock.notify_all()
            return
        frame = (np.ascontiguousarray(frame).tobytes()
                 if isinstance(frame, np.ndarray) else frame)
        # metadata snapshot per frame (`EncoderPool.cpp:389-449`).  Submit
        # and enqueue under one lock acquisition so the pending order always
        # matches submission order (submit does not block).
        with self._lock:
            fut = self._executor.submit(self._encode_job, frame_number, frame,
                                        metadata or self._metadata)
            fut.add_done_callback(self._job_done)
            self._pending.append((frame_number, fut))
            self._lock.notify_all()

    def _job_done(self, _fut: Future) -> None:
        with self._lock:
            self._in_flight -= 1
            self._lock.notify_all()

    # CFHD_WaitForSample
    def wait_for_sample(self, timeout: float | None = None) -> SampleBuffer:
        """Blocks until the next in-order sample is ready, like
        `CFHD_WaitForSample` (`EncoderPool.cpp:297`): an empty queue waits
        for the next submission rather than raising."""
        with self._lock:
            while not self._pending:
                if not self._lock.wait(timeout=timeout):
                    raise api.CFHDError(api.ErrorCode.THREAD_WAIT_FAILED,
                                        "timed out waiting for a sample")
            frame_number, fut = self._pending.popleft()
            self._lock.notify_all()
        data = fut.result(timeout=timeout)
        return SampleBuffer(frame_number=frame_number, data=data)

    # CFHD_TestForSample
    def test_for_sample(self) -> SampleBuffer | None:
        with self._lock:
            if not self._pending or not self._pending[0][1].done():
                return None
            frame_number, fut = self._pending.popleft()
            self._lock.notify_all()
        return SampleBuffer(frame_number=frame_number, data=fut.result())

    # CFHD_ReleaseSampleBuffer is a no-op (GC owns the buffers)
    def release_sample_buffer(self, buffer: SampleBuffer) -> None:
        pass

    # CFHD_ReleaseEncoderPool
    def release(self) -> None:
        self.stop()


@dataclass
class FrameBuffer:
    """A decoded frame with its submission number."""

    frame_number: int
    data: np.ndarray  # (H, row_bytes) uint8


class DecoderPool:
    """Asynchronous batch decoder: submit samples / harvest frames in order.

    The decode-side counterpart of the EncoderPool device batcher.  The
    reference pipelines its header parse with the threaded band decode
    inside one DecodeSample (`Codec/entropy_threading.c:139`); here the
    same overlap happens across batches: a parse thread walks sample
    headers and builds the device row tensors (the native walker,
    `bitstream/fastwalk.py`) for batch N+1 while the device thread runs
    the decode program (`IntraCodec._decode_device_program`: band
    entropy decode + inverse DWT + dither + output pack on the chip)
    for batch N.  Samples the device path cannot serve (legacy
    codesets, peaks bands, wrong dims) fall back to the host decoder
    per frame, like `decode_batch_device`.
    """

    DEVICE_BATCH = 8

    def __init__(self, thread_count: int = 2,
                 job_queue_length: int = 32) -> None:
        if thread_count < 1 or job_queue_length < 1:
            raise api.CFHDError(api.ErrorCode.INVALID_ARGUMENT)
        self.queue_length = job_queue_length
        self._lock = threading.Condition()
        self._submit_queue: deque = deque()
        self._device_queue: deque = deque()
        self._pending: deque[tuple[int, Future]] = deque()
        self._in_flight = 0
        self._threads: list[threading.Thread] = []
        self._stopping = False
        self._parse_busy = False
        self._prepared = False

    def prepare_to_decode(self, width: int, height: int,
                          output_format=api.PixelFormat.YUY2) -> None:
        from cineform_tpu.models.intra import IntraCodec

        if output_format == api.PixelFormat.YUY2:
            self._output = "YUY2"
        elif output_format == api.PixelFormat.BGRA:
            self._output = "BGRA"
        else:
            raise api.CFHDError(
                api.ErrorCode.BADFORMAT,
                "device decode pool outputs YUY2 or BGRA; other formats "
                "go through api.Decoder")
        self.width, self.height = width, height
        # quality only shapes the encode quantizers; decode reads the
        # quants from each sample's band headers
        self._codec = IntraCodec(width=width, height=height, quality=4)
        self._prepared = True

    def start(self) -> None:
        if not self._prepared:
            raise api.CFHDError(api.ErrorCode.UNEXPECTED,
                                "prepare_to_decode first")
        if self._threads:
            return
        self._stopping = False
        self._parse_busy = False
        for name, target in (("cfhd-decode-parse", self._parse_loop),
                             ("cfhd-decode-device", self._device_loop)):
            t = threading.Thread(target=target, name=name, daemon=True)
            t.start()
            self._threads.append(t)

    def stop(self) -> None:
        if not self._threads:
            return
        with self._lock:
            self._stopping = True
            self._lock.notify_all()
        for t in self._threads:
            t.join()
        self._threads = []

    # --- pipeline stages -----------------------------------------------------

    def _parse_loop(self) -> None:
        """Stage 1: host header walk + row tensor build + device upload."""
        while True:
            with self._lock:
                while not self._submit_queue and not self._stopping:
                    self._lock.wait()
                if not self._submit_queue:
                    return  # stopping and drained
                jobs = [self._submit_queue.popleft()
                        for _ in range(min(len(self._submit_queue),
                                           self.DEVICE_BATCH))]
                self._parse_busy = True
            try:
                samples = [j[1] for j in jobs]
                args = self._codec._decode_rows_args(samples)
                item = (jobs, samples, args)
            except BaseException as exc:
                for j in jobs:
                    if not j[-1].done():
                        j[-1].set_exception(exc)
                with self._lock:
                    self._parse_busy = False
                    self._lock.notify_all()
                continue
            with self._lock:
                self._device_queue.append(item)
                self._parse_busy = False
                self._lock.notify_all()

    def _device_loop(self) -> None:
        """Stage 2: device decode program + host fallback + delivery."""
        import jax

        codec = self._codec
        while True:
            with self._lock:
                while not self._device_queue and not (
                        self._stopping and not self._submit_queue
                        and not self._parse_busy):
                    self._lock.wait()
                if not self._device_queue:
                    return  # stopping and fully drained
                jobs, samples, args = self._device_queue.popleft()
            try:
                pays, nchs, qns, lins, lp, fallback = args
                batch = len(samples)
                if len(fallback) < batch:
                    out, ovf = codec._decode_device_program(
                        pays, nchs, qns, lins, lp, batch, 0, self._output)
                    out = np.asarray(jax.device_get(out))
                    for i in np.nonzero(np.asarray(ovf))[0]:
                        fallback.add(int(i))
                else:
                    shape = ((self.height, self.width, 4)
                             if self._output == "BGRA"
                             else (self.height, 2 * self.width))
                    out = np.zeros((batch,) + shape, np.uint8)
                for i in sorted(fallback):
                    out[i] = self._host_decode(samples[i])
                for j, frame in zip(jobs, out):
                    j[-1].set_result(frame)
            except BaseException as exc:
                for j in jobs:
                    if not j[-1].done():
                        j[-1].set_exception(exc)

    def _host_decode(self, sample: bytes) -> np.ndarray:
        if self._output == "BGRA":
            from cineform_tpu.models.intra_host import decode_sample_bgra
            return np.frombuffer(decode_sample_bgra(sample),
                                 np.uint8).reshape(self.height,
                                                   self.width, 4)
        return self._codec.decode_batch([sample])[0]

    # --- API -----------------------------------------------------------------

    def decode_async_sample(self, frame_number: int, sample: bytes) -> None:
        if not self._threads:
            raise api.CFHDError(api.ErrorCode.UNEXPECTED,
                                "pool not started")
        with self._lock:
            while self._in_flight >= self.queue_length:
                self._lock.wait()
            self._in_flight += 1
            fut = Future()
            fut.add_done_callback(self._job_done)
            self._submit_queue.append((frame_number, sample, fut))
            self._pending.append((frame_number, fut))
            self._lock.notify_all()

    def _job_done(self, _fut: Future) -> None:
        with self._lock:
            self._in_flight -= 1
            self._lock.notify_all()

    def wait_for_frame(self, timeout: float | None = None) -> FrameBuffer:
        with self._lock:
            while not self._pending:
                if not self._lock.wait(timeout=timeout):
                    raise api.CFHDError(api.ErrorCode.THREAD_WAIT_FAILED,
                                        "timed out waiting for a frame")
            frame_number, fut = self._pending.popleft()
            self._lock.notify_all()
        return FrameBuffer(frame_number=frame_number,
                           data=fut.result(timeout=timeout))

    def test_for_frame(self) -> FrameBuffer | None:
        with self._lock:
            if not self._pending or not self._pending[0][1].done():
                return None
            frame_number, fut = self._pending.popleft()
            self._lock.notify_all()
        return FrameBuffer(frame_number=frame_number, data=fut.result())

    def release(self) -> None:
        self.stop()
