"""Asynchronous encoder pool: submit-N frames / harvest in order.

Behavioral contract: `EncoderSDK/EncoderPool.cpp:59-449` — N worker encoders
fed from a bounded job queue, per-frame metadata snapshots, and strictly
in-submission-order delivery through WaitForSample/TestForSample.  The
CPU-thread pool of the reference maps naturally onto host threads here
because the heavy stages release the GIL (NumPy kernels and the native
entropy coder); device batching (models/intra.IntraCodec.encode_batch) is
the higher-throughput TPU path when frames arrive in bulk.
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


class EncoderPool:
    """CFHD_CreateEncoderPool .. CFHD_ReleaseEncoderPool."""

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

    # CFHD_GetAsyncInputFormats
    def get_input_formats(self) -> tuple[api.PixelFormat, ...]:
        return api.Encoder.INPUT_FORMATS

    # CFHD_PrepareEncoderPool
    def prepare_to_encode(self, width: int, height: int,
                          pixel_format: api.PixelFormat,
                          encoded_format=api.EncodedFormat.YUV_422,
                          encoding_flags=api.EncodingFlags.NONE,
                          quality=api.EncodingQuality.FILMSCAN1) -> None:
        probe = api.Encoder()  # validates arguments
        probe.prepare_to_encode(width, height, pixel_format, encoded_format,
                                encoding_flags, quality)
        if encoding_flags & api.EncodingFlags.YUV_2FRAME_GOP:
            # GOP pairing is stateful across submissions; the async pool
            # encodes each job independently (intra), like TestCFHD -E
            raise api.CFHDError(api.ErrorCode.BADFORMAT,
                                "2-frame GOP is not supported in the pool")
        self.width, self.height = width, height
        self.quality = probe.quality
        self.pixel_format = pixel_format
        self.encoded_format = encoded_format
        self._prepared = True

    # CFHD_AttachEncoderPoolMetadata
    def attach_metadata(self, metadata) -> None:
        self._metadata = metadata

    # CFHD_StartEncoderPool
    def start(self) -> None:
        if not self._prepared:
            raise api.CFHDError(api.ErrorCode.ENCODING_NOT_STARTED)
        if self._executor is None:
            self._executor = ThreadPoolExecutor(
                max_workers=self.thread_count,
                thread_name_prefix="cfhd-encoder")

    # CFHD_StopEncoderPool
    def stop(self) -> None:
        if self._executor is not None:
            self._executor.shutdown(wait=True)
            self._executor = None

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
        if self._executor is None:
            raise api.CFHDError(api.ErrorCode.ENCODING_NOT_STARTED)
        # The queue bound limits jobs in flight (unfinished encodes), not
        # unharvested results — finished samples wait in the output queue
        # (`EncoderSDK/EncoderQueue.h:45-51` job states).
        with self._lock:
            while self._in_flight >= self.queue_length:
                self._lock.wait()
            self._in_flight += 1
        if isinstance(frame, np.ndarray):
            frame = np.ascontiguousarray(frame).tobytes()
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
