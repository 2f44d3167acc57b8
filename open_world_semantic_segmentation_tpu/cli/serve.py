"""Streaming segmentation inference server.

Minimal production-style serving for the streaming-inference path of
BASELINE config #5: one jitted forward compiled at startup for a fixed
input size, a single-worker HTTP front end (the TPU is serialized anyway),
PNG label maps out.

Endpoints:
  GET  /healthz           -> {"status": "ok", "model": ..., "input": [H, W]}
  GET  /metrics           -> request/error counts + latency stats (JSON)
  POST /segment           -> body: image bytes (any PIL-readable format);
                             response: PNG label map (uint8 class ids).
                             Query ?scores=dissum returns a float16 npy
                             anomaly-confidence map instead.
  POST /stream            -> video-rate client path: ONE persistent
                             connection carrying many frames. Request body
                             is a sequence of <u32 big-endian length><image
                             bytes> records (length 0 or EOF ends the
                             stream); the response streams back the same
                             framing around PNG label maps (or npy conf
                             maps with ?scores=dissum), in order. The
                             handler keeps 2 frames in flight: jax dispatch
                             is async, so the device runs frame N while the
                             thread decodes frame N+1 — per-frame HTTP
                             setup/teardown disappears and decode overlaps
                             compute (the server-side twin of
                             tools/bench_stream.py --pipeline-depth).

Requests are handled on a thread per connection (ThreadingHTTPServer):
host-side PIL decode and PNG encode for concurrent requests overlap, while
the device lock serializes only the jitted forward (one chip executes one
program at a time anyway).

With ``--max-batch N`` (default 1 = off) concurrent requests are
micro-batched: a collector thread coalesces up to N decoded images that
arrive within ``--batch-wait-ms`` into ONE device dispatch (padded to the
next power-of-two batch size). Startup compiles only batch size 1; the
larger sizes warm in a background thread, so startup time is no longer
linear in the batch-size ladder. Batch-8
inference amortizes per-dispatch overhead and raises device utilization
under concurrent load — the standard production-serving pattern.

Usage:
  python -m open_world_semantic_segmentation_tpu.cli.serve \
      --cfg configs/test_ood_street.yaml --port 8501 --height 720 --width 1280
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from ._common import (
    build_anomaly_model,
    compute_dtype,
    config_parser,
    init_or_load_variables,
)


class _Job:
    """One request in the micro-batch queue."""

    __slots__ = ("arr", "done", "pred", "conf", "err")

    def __init__(self, arr):
        self.arr = arr
        self.done = threading.Event()
        self.pred = self.conf = self.err = None


class Segmenter:
    """Fixed-size jitted forward with PIL in / label-PNG out."""

    def __init__(self, cfg, precision_dtype, height: int, width: int,
                 max_batch: int = 1, batch_wait_ms: float = 5.0,
                 quant: str = "off", calib_glob: str = None,
                 device_input: bool = False, artifact: str = None):
        """``device_input``: ship the resized image as uint8 and run the
        ImageNet normalization ON DEVICE (4x fewer bytes over the
        host->device link — the bottleneck behind a tunneled chip — and
        no host float conversion). Label/conf outputs are identical up to
        the uint8 resize rounding.

        ``artifact``: serve a saved AOT export (cli/export_model) instead
        of building the model — no flax/framework tracing at startup, the
        weights are baked into the StableHLO; input size/batch come from
        the artifact metadata (single-scale, method != "none")."""
        import jax
        import jax.numpy as jnp

        from ..data.native import resize_normalize
        from ..openset.scoring import dissum_conf

        if device_input and artifact:
            raise ValueError(
                "--device-input needs the normalization inside the "
                "program, which a saved artifact does not contain — "
                "re-export with normalization baked in or drop one flag")
        self.device_input = device_input
        self.resize_normalize = resize_normalize
        self._lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "errors": 0, "batches": 0,
                      "latency_ms_sum": 0.0, "latency_ms_max": 0.0}

        if artifact:
            from ..core.export import load_exported, read_meta

            # validate the cheap metadata header BEFORE deserializing the
            # (possibly hundreds of MB) StableHLO payload
            meta = read_meta(artifact)
            if meta.get("pyramid"):
                raise ValueError(
                    "serve needs a single-scale artifact (export without "
                    "--pyramid)")
            if meta.get("method") == "none":
                raise ValueError("serve needs an artifact with a conf "
                                 "method (exported with --method none)")
            if meta.get("npm"):
                raise ValueError(
                    "NPM artifacts take (image, prototype) inputs — serve "
                    "only dispatches single-image artifacts")
            afn, meta = load_exported(artifact)
            has_input_meta = "input" in meta
            ab, ah, aw, _ = meta.get("input", [1, height, width, 3])
            self.size = (ah, aw)
            self.model_name = meta.get("model", "artifact")
            self.variables = None
            # artifacts are exported at a FIXED batch; pad every dispatch
            # to it — say so when that discards a CLI flag (but only when
            # the shape was actually read from the artifact: a metadata
            # header without 'input' falls back to the CLI values and
            # overrides nothing)
            if has_input_meta and int(max_batch) != ab:
                print(f"NOTE: artifact batch={ab} overrides "
                      f"--max-batch {max_batch} (micro-batching follows "
                      "the artifact; re-export with --batch to change)")
            if has_input_meta and (ah, aw) != (height, width):
                print(f"NOTE: artifact input {ah}x{aw} overrides "
                      f"--height/--width {height}x{width}")
            max_batch = ab
            fwd = lambda _vars, imgs: afn(imgs)  # noqa: E731
        else:
            self.size = (height, width)
            self.model = build_anomaly_model(
                cfg, train=False, use_softmax=True,
                dtype=precision_dtype, quant=quant)
            self.variables = init_or_load_variables(
                cfg, self.model, jnp.zeros((1, 64, 64, 3), jnp.float32))
            if quant != "off":
                from ._common import calibrate_for_quant

                self.variables = calibrate_for_quant(
                    cfg, self.variables, self.size, dtype=precision_dtype,
                    use_softmax=True, calib_glob=calib_glob, quant=quant)
            self.model_name = (f"{cfg.MODEL.arch_encoder}+"
                               f"{cfg.MODEL.arch_decoder}")

            @jax.jit
            def fwd(variables, imgs):
                if device_input:
                    from ..data.odgt import device_normalize

                    imgs = device_normalize(imgs)
                out = self.model.apply(variables, imgs, seg_size=self.size)
                scores = out["scores"]
                return (jnp.argmax(scores, axis=-1).astype(jnp.uint8),
                        jax.vmap(dissum_conf)(scores).astype(jnp.float16))

        self._fwd = fwd
        self._in_dtype = np.uint8 if self.device_input else np.float32
        # startup compiles ONLY batch size 1 (the server answers its first
        # request immediately); the larger padded sizes warm concurrently
        # in a background thread — a request landing on a not-yet-warm
        # size just blocks on that one compile instead of every startup
        # paying the full serial ladder
        self.max_batch = max(1, int(max_batch))
        self.batch_wait = batch_wait_ms / 1e3
        self._batch_sizes = [self.max_batch] if artifact else [1]
        while self._batch_sizes[-1] < self.max_batch:
            self._batch_sizes.append(
                min(self._batch_sizes[-1] * 2, self.max_batch))
        self._jnp = jnp
        self._fwd(self.variables,
                  jnp.zeros((self._batch_sizes[0], *self.size, 3),
                            jnp.uint8 if self.device_input
                            else jnp.float32))
        self.warmed = [self._batch_sizes[0]]
        if len(self._batch_sizes) > 1:
            threading.Thread(target=self._warm_batches, daemon=True).start()

        self._queue = None
        if self.max_batch > 1:
            import queue

            self._queue = queue.Queue()
            threading.Thread(target=self._collector, daemon=True).start()

    def _warm_batches(self):
        """Background compile of the non-unit padded batch sizes (jit
        dispatch is thread-safe; a concurrent request for the same shape
        simply waits on the same cache entry)."""
        for b in self._batch_sizes[1:]:
            self._fwd(self.variables,
                      self._jnp.zeros((b, *self.size, 3),
                                      self._in_dtype))
            self.warmed.append(b)

    def _dispatch(self, arrs):
        """Pad + enqueue one device dispatch; returns DEVICE arrays (jax
        dispatch is async — materializing with np.asarray is the caller's
        synchronization point, which is what lets /stream pipeline)."""
        import jax.numpy as jnp

        n = len(arrs)
        size = next(b for b in self._batch_sizes if b >= n)
        batch = np.zeros((size, *self.size, 3), self._in_dtype)
        for i, a in enumerate(arrs):
            batch[i] = a
        with self._lock:
            pred, conf = self._fwd(self.variables, jnp.asarray(batch))
        with self._stats_lock:
            self.stats["batches"] += 1
        return pred, conf

    def _run_batch(self, arrs):
        """One padded device dispatch over a list of HWC float arrays."""
        pred, conf = self._dispatch(arrs)
        n = len(arrs)
        return np.asarray(pred)[:n], np.asarray(conf)[:n]

    def _collector(self):
        """Micro-batcher: coalesce jobs arriving within batch_wait into one
        dispatch of up to max_batch images."""
        import queue

        while True:
            jobs = [self._queue.get()]
            deadline = time.perf_counter() + self.batch_wait
            while len(jobs) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    jobs.append(self._queue.get(timeout=left))
                except queue.Empty:
                    break
            try:
                preds, confs = self._run_batch([j.arr for j in jobs])
                for j, p, c in zip(jobs, preds, confs):
                    j.pred, j.conf = p, c
            except Exception as e:  # pragma: no cover - device failure
                for j in jobs:
                    j.err = e
            for j in jobs:
                j.done.set()

    def _decode(self, image_bytes: bytes):
        from PIL import Image

        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        if self.device_input:
            # ship uint8; normalization happens inside the program
            return np.asarray(img.resize((self.size[1], self.size[0]),
                                         Image.BILINEAR), np.uint8)
        return self.resize_normalize(np.asarray(img),
                                     (self.size[0], self.size[1]))

    def segment(self, image_bytes: bytes):
        tic = time.perf_counter()
        try:
            arr = self._decode(image_bytes)
            # decode/resize above runs concurrently across request threads;
            # only the device dispatch is serialized
            if self._queue is not None:
                job = _Job(arr)
                self._queue.put(job)
                job.done.wait()
                if job.err is not None:
                    raise job.err
                pred, conf = job.pred, job.conf
            else:
                preds, confs = self._run_batch([arr])
                pred, conf = preds[0], confs[0]
        except Exception:
            with self._stats_lock:
                self.stats["errors"] += 1
            raise
        ms = (time.perf_counter() - tic) * 1e3
        with self._stats_lock:
            self.stats["requests"] += 1
            self.stats["latency_ms_sum"] += ms
            self.stats["latency_ms_max"] = max(
                self.stats["latency_ms_max"], ms)
        return pred, conf

    def stream(self, rfile, wfile, scores: bool = False,
               depth: int = 2) -> int:
        """Length-prefixed frame stream over one connection (POST /stream).

        Reads ``<u32 length><image bytes>`` records from ``rfile`` (length
        0 or EOF terminates), writes the same framing around the encoded
        results to ``wfile``, in order. Up to ``depth`` frames stay in
        flight on the device: ``_dispatch`` returns un-materialized device
        arrays, so the np.asarray in the drain step is the only sync point
        — decode of the next frame overlaps device compute of the previous
        one. Returns the number of frames served."""
        import collections
        import struct

        from PIL import Image

        pending = collections.deque()  # (tic, pred_dev, conf_dev)
        served = 0

        def drain_one():
            nonlocal served
            tic, pred_dev, conf_dev = pending.popleft()
            if scores:
                payload = io.BytesIO()
                np.save(payload, np.asarray(conf_dev)[0])
                payload = payload.getvalue()
            else:
                buf = io.BytesIO()
                Image.fromarray(np.asarray(pred_dev)[0], "L").save(
                    buf, format="PNG")
                payload = buf.getvalue()
            wfile.write(struct.pack(">I", len(payload)))
            wfile.write(payload)
            served += 1
            ms = (time.perf_counter() - tic) * 1e3
            with self._stats_lock:
                self.stats["requests"] += 1
                self.stats["latency_ms_sum"] += ms
                self.stats["latency_ms_max"] = max(
                    self.stats["latency_ms_max"], ms)

        while True:
            hdr = rfile.read(4)
            if len(hdr) < 4:
                break
            (n,) = struct.unpack(">I", hdr)
            if n == 0:
                break
            data = rfile.read(n)
            if len(data) < n:
                break
            tic = time.perf_counter()
            try:
                arr = self._decode(data)
            except Exception:
                with self._stats_lock:
                    self.stats["errors"] += 1
                # a frame that fails to decode poisons the ordered stream;
                # drain what's in flight and end the response (the client
                # sees fewer results than frames and resyncs)
                break
            pred_dev, conf_dev = self._dispatch([arr])
            pending.append((tic, pred_dev, conf_dev))
            if len(pending) >= depth:
                drain_one()
        while pending:
            drain_one()
        return served

    def metrics(self) -> dict:
        with self._stats_lock:
            s = dict(self.stats)
        n = s.pop("latency_ms_sum"), s["requests"]
        s["latency_ms_avg"] = round(n[0] / n[1], 3) if n[1] else 0.0
        s["latency_ms_max"] = round(s["latency_ms_max"], 3)
        s["warmed_batch_sizes"] = list(self.warmed)
        return s


def make_handler(segmenter: Segmenter):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            route = self.path.split("?", 1)[0]
            if route == "/healthz":
                body = json.dumps({
                    "status": "ok",
                    "model": segmenter.model_name,
                    "input": list(segmenter.size),
                }).encode()
                self._send(200, body, "application/json")
            elif route == "/metrics":
                self._send(200, json.dumps(segmenter.metrics()).encode(),
                           "application/json")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            route = self.path.split("?", 1)[0]
            if route == "/stream":
                # persistent frame stream: the body is OUR framing, not an
                # HTTP entity — read rfile directly until the 0-sentinel /
                # EOF and stream the response as it is produced (no
                # Content-Length; the connection closes at end-of-stream)
                self.close_connection = True
                self.send_response(200)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Connection", "close")
                self.end_headers()
                segmenter.stream(self.rfile, self.wfile,
                                 scores="scores=dissum" in self.path)
                return
            if route != "/segment":
                self._send(404, b"not found", "text/plain")
                return
            length = int(self.headers.get("Content-Length", 0))
            data = self.rfile.read(length)
            try:
                pred, conf = segmenter.segment(data)
            except Exception as e:  # malformed image etc.
                self._send(400, str(e).encode(), "text/plain")
                return
            if "scores=dissum" in self.path:
                buf = io.BytesIO()
                np.save(buf, conf)
                self._send(200, buf.getvalue(), "application/octet-stream")
            else:
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(pred, "L").save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")

    return Handler


def serve(cfg, precision_dtype, host="127.0.0.1", port=8501, height=720,
          width=1280, max_batch=1, batch_wait_ms=5.0, quant="off",
          calib_glob=None, device_input=False, artifact=None):
    segmenter = Segmenter(cfg, precision_dtype, height, width,
                          max_batch=max_batch, batch_wait_ms=batch_wait_ms,
                          quant=quant, calib_glob=calib_glob,
                          device_input=device_input, artifact=artifact)
    server = ThreadingHTTPServer((host, port), make_handler(segmenter))
    print(f"serving {segmenter.model_name} on "
          f"http://{host}:{server.server_address[1]} "
          f"(input {segmenter.size[0]}x{segmenter.size[1]})", flush=True)
    return server


def main(argv=None):
    parser = config_parser(__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8501)
    parser.add_argument("--height", type=int, default=720)
    parser.add_argument("--width", type=int, default=1280)
    parser.add_argument("--max-batch", type=int, default=1,
                        help="micro-batch concurrent requests into one "
                             "device dispatch (1 = off)")
    parser.add_argument("--batch-wait-ms", type=float, default=5.0,
                        help="max time to wait for a batch to fill")
    parser.add_argument("--quant", choices=["off", "int8", "int8-hybrid",
                                          "int8-3x3"],
                        default="off",
                        help="opt-in int8 PTQ inference (ops/quant.py)")
    parser.add_argument("--calib-glob", default=None,
                        help="glob of representative images for int8 "
                             "activation calibration")
    parser.add_argument("--device-input", action="store_true",
                        help="ship uint8 images and normalize on device "
                             "(4x fewer bytes over the host->device link)")
    parser.add_argument("--artifact", default=None,
                        help="serve a saved AOT export (cli/export_model) "
                             "— no model build/tracing at startup")
    args = parser.parse_args(argv)
    from ._common import parse_config

    cfg = parse_config(args)
    server = serve(cfg, compute_dtype(args), args.host, args.port,
                   args.height, args.width, max_batch=args.max_batch,
                   batch_wait_ms=args.batch_wait_ms, quant=args.quant,
                   calib_glob=args.calib_glob,
                   device_input=args.device_input, artifact=args.artifact)
    server.serve_forever()


if __name__ == "__main__":
    main()
