"""Serving endpoint test: real HTTP round trip against the jitted model."""

import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from open_world_semantic_segmentation_tpu.core.config import Config
from open_world_semantic_segmentation_tpu.cli import serve as serve_mod

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def server():
    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    srv = serve_mod.serve(cfg, jnp.float32, host="127.0.0.1", port=0,
                          height=32, width=48)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["input"] == [32, 48]


def test_segment_png_roundtrip(server):
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (60, 90, 3),
                                          dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    req = urllib.request.Request(server + "/segment", data=buf.getvalue(),
                                 method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "image/png"
        pred = np.array(Image.open(io.BytesIO(r.read())))
    assert pred.shape == (32, 48)
    assert pred.max() < 13


def test_segment_scores_npy(server):
    img = Image.new("RGB", (48, 32))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    req = urllib.request.Request(server + "/segment?scores=dissum",
                                 data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req) as r:
        conf = np.load(io.BytesIO(r.read()))
    assert conf.shape == (32, 48)
    assert conf.dtype == np.float16


def test_artifact_server(tmp_path):
    """--artifact: serve a saved AOT export — no model build at startup,
    size/batch from the artifact metadata, same HTTP surface."""
    from open_world_semantic_segmentation_tpu.cli import export_model

    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    path = str(tmp_path / "m.owss")
    export_model.main(cfg, jnp.float32, height=32, width=48, out=path)

    srv = serve_mod.serve(cfg, jnp.float32, host="127.0.0.1", port=0,
                          artifact=path)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(base + "/healthz") as r:
            body = json.loads(r.read())
        assert body["input"] == [32, 48]  # from artifact meta, not args
        img = Image.fromarray(
            np.random.default_rng(2).integers(0, 255, (32, 48, 3),
                                              dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(base + "/segment",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            pred = np.array(Image.open(io.BytesIO(r.read())))
        assert pred.shape == (32, 48) and pred.max() < 13
    finally:
        srv.shutdown()


def test_artifact_rejects_incompatible_meta(tmp_path):
    """Pyramid/method-none/NPM artifacts are rejected from the metadata
    header BEFORE the (possibly huge) payload is deserialized — the blob
    here is garbage, so passing means the guard fired first."""
    import pytest

    from open_world_semantic_segmentation_tpu.core.export import (
        save_exported)

    cases = [({"pyramid": True}, "single-scale"),
             ({"method": "none"}, "conf"),
             ({"npm": True}, "prototype")]
    for i, (meta, match) in enumerate(cases):
        path = str(tmp_path / f"bad{i}.owss")
        save_exported(path, b"not-stablehlo", meta)
        with pytest.raises(ValueError, match=match):
            serve_mod.serve(Config(), jnp.float32, host="127.0.0.1",
                            port=0, artifact=path)


def test_device_input_server():
    """--device-input: uint8 ships to the device, normalization runs
    in-program; label output agrees with the host-normalized path up to
    resize rounding (full agreement here: same bilinear at same size)."""
    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    srv = serve_mod.serve(cfg, jnp.float32, host="127.0.0.1", port=0,
                          height=32, width=48, device_input=True)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        img = Image.fromarray(
            np.random.default_rng(1).integers(0, 255, (32, 48, 3),
                                              dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(base + "/segment",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req) as r:
            pred = np.array(Image.open(io.BytesIO(r.read())))
        assert pred.shape == (32, 48)
        assert pred.max() < 13
    finally:
        srv.shutdown()


def test_segment_malformed_input_400(server):
    req = urllib.request.Request(server + "/segment", data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_concurrent_requests(server):
    """ThreadingHTTPServer: 8 simultaneous POSTs all succeed (decode/encode
    overlap across threads, the device lock serializes the forward)."""
    rng = np.random.default_rng(1)
    payloads = []
    for _ in range(8):
        img = Image.fromarray(rng.integers(0, 255, (40, 64, 3),
                                           dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payloads.append(buf.getvalue())

    results = [None] * len(payloads)

    def post(i):
        req = urllib.request.Request(server + "/segment", data=payloads[i],
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            results[i] = np.array(Image.open(io.BytesIO(r.read())))

    threads = [threading.Thread(target=post, args=(i,))
               for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for pred in results:
        assert pred is not None and pred.shape == (32, 48)


def test_microbatched_server():
    """--max-batch: concurrent requests coalesce into fewer device
    dispatches; results identical per request."""
    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    srv = serve_mod.serve(cfg, jnp.float32, host="127.0.0.1", port=0,
                          height=32, width=48, max_batch=4,
                          batch_wait_ms=200.0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        img = Image.fromarray(np.random.default_rng(2).integers(
            0, 255, (40, 64, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        payload = buf.getvalue()

        # baseline single request (its own batch)
        req = urllib.request.Request(base + "/segment", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            ref = np.array(Image.open(io.BytesIO(r.read())))

        results = [None] * 8

        def post(i):
            rq = urllib.request.Request(base + "/segment", data=payload,
                                        method="POST")
            with urllib.request.urlopen(rq) as rr:
                results[i] = np.array(Image.open(io.BytesIO(rr.read())))

        threads = [threading.Thread(target=post, args=(i,))
                   for i in range(8)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for pred in results:
            # per-image math is batch-independent (eval BN is affine); allow
            # a sliver of argmax tie-flips from batch-size-dependent tiling
            agree = (pred == ref).mean()
            assert agree >= 0.99, f"batched/single agreement {agree}"

        with urllib.request.urlopen(base + "/metrics") as r:
            m = json.loads(r.read())
        assert m["requests"] == 9
        # the 200ms window must have coalesced at least one multi-image
        # batch: 9 requests in fewer than 9 dispatches
        assert m["batches"] < 9
    finally:
        srv.shutdown()


def test_quantized_server():
    """--quant int8: server calibrates at startup and serves int8."""
    cfg = Config()
    cfg.MODEL.arch_encoder = "resnet18dilated"
    cfg.MODEL.arch_decoder = "ppm_deepsup_embedding"
    cfg.MODEL.fc_dim = 512
    cfg.DATASET.num_class = 13
    srv = serve_mod.serve(cfg, jnp.float32, host="127.0.0.1", port=0,
                          height=32, width=48, quant="int8")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        img = Image.fromarray(np.random.default_rng(4).integers(
            0, 255, (40, 64, 3), dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        req = urllib.request.Request(base + "/segment", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            pred = np.array(Image.open(io.BytesIO(r.read())))
        assert pred.shape == (32, 48) and pred.max() < 13
    finally:
        srv.shutdown()


def test_stream_endpoint(server):
    """POST /stream: 3 frames over ONE socket, length-prefixed in and out;
    each streamed result must equal the per-request /segment result for
    the same frame (order + correctness through the pipelined path)."""
    import socket
    import struct

    rng = np.random.default_rng(7)
    frames, singles = [], []
    for _ in range(3):
        img = Image.fromarray(rng.integers(0, 255, (40, 64, 3),
                                           dtype=np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        frames.append(buf.getvalue())
        req = urllib.request.Request(server + "/segment", data=frames[-1],
                                     method="POST")
        with urllib.request.urlopen(req) as r:
            singles.append(np.array(Image.open(io.BytesIO(r.read()))))

    host, port = server.split("//")[1].split(":")
    with socket.create_connection((host, int(port)), timeout=60) as sock:
        sock.sendall(b"POST /stream HTTP/1.1\r\n"
                     b"Host: x\r\nConnection: close\r\n\r\n")
        for f in frames:
            sock.sendall(struct.pack(">I", len(f)) + f)
        sock.sendall(struct.pack(">I", 0))

        raw = b""
        while True:
            chunk = sock.recv(65536)
            if not chunk:
                break
            raw += chunk
    head, _, body = raw.partition(b"\r\n\r\n")
    assert b"200" in head.split(b"\r\n", 1)[0]
    results = []
    while body:
        (n,) = struct.unpack(">I", body[:4])
        results.append(np.array(Image.open(io.BytesIO(body[4:4 + n]))))
        body = body[4 + n:]
    assert len(results) == 3
    for got, want in zip(results, singles):
        assert got.shape == (32, 48)
        assert (got == want).mean() >= 0.99  # batch-tiling tie-flips only


def test_metrics_endpoint(server):
    # push one good and one malformed request so counts are self-contained
    img = Image.new("RGB", (48, 32))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    urllib.request.urlopen(urllib.request.Request(
        server + "/segment", data=buf.getvalue(), method="POST")).read()
    with pytest.raises(urllib.error.HTTPError):
        urllib.request.urlopen(urllib.request.Request(
            server + "/segment", data=b"junk", method="POST"))

    with urllib.request.urlopen(server + "/metrics") as r:
        m = json.loads(r.read())
    assert m["requests"] >= 1
    assert m["errors"] >= 1
    assert m["latency_ms_avg"] > 0
    assert m["latency_ms_max"] >= m["latency_ms_avg"]
