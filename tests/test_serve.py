"""Streaming inference server (serve.py): ordering, pipelining window,
artifact dumping, per-request error isolation, and the stdio loop.

Tiny net resolution so the CPU test backend compiles once, fast."""

import dataclasses
import io as _io
import json
import os

import numpy as np
import pytest
from PIL import Image

from scenedepthestimation_tpu import api, configs
from scenedepthestimation_tpu.serve import serve_requests, serve_stdio


@pytest.fixture(scope="module")
def predictor():
    cfg = configs.get("mono_kitti_192x640_fp32")
    cfg = dataclasses.replace(
        cfg, mono=dataclasses.replace(cfg.mono, height=32, width=64)
    )
    return api.load_weights(None, cfg, seed=0)


def _frames(tmp_path, n, hw=(32, 64)):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, size=(*hw, 3), dtype=np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def test_serve_requests_order_and_artifacts(predictor, tmp_path):
    paths = _frames(tmp_path, 5)
    reqs = [{"id": i, "image": p} for i, p in enumerate(paths)]
    out_dir = str(tmp_path / "out")
    resps = list(
        serve_requests(
            predictor, reqs, out_dir, depth=2, artifacts="depth,disp,png"
        )
    )
    assert [r["id"] for r in resps] == [0, 1, 2, 3, 4]
    for i, r in enumerate(resps):
        assert r["shape"] == [32, 64]
        assert r["ms"] > 0
        assert os.path.exists(r["output"])
        assert os.path.exists(os.path.join(out_dir, f"f{i}_disp.npy"))
        assert os.path.exists(os.path.join(out_dir, f"f{i}_disp.png"))
    dep = np.load(resps[0]["output"])
    assert dep.shape == (32, 64) and np.isfinite(dep).all() and (dep > 0).all()


def test_serve_requests_matches_predict_mono(predictor, tmp_path):
    (p,) = _frames(tmp_path, 1)
    out_dir = str(tmp_path / "out2")
    (resp,) = serve_requests(
        predictor, [{"id": 0, "image": p}], out_dir, depth=3
    )
    ref = api.predict_mono(
        predictor, np.asarray(Image.open(p).convert("RGB"))
    )
    np.testing.assert_allclose(
        np.load(resp["output"]), ref["depth"], rtol=1e-6
    )


def test_serve_requests_error_isolation(predictor, tmp_path):
    paths = _frames(tmp_path, 2)
    reqs = [
        {"id": "a", "image": paths[0]},
        {"id": "bad", "image": str(tmp_path / "missing.png")},
        {"id": "worse"},  # no image key at all
        {"id": "b", "image": paths[1]},
    ]
    resps = list(
        serve_requests(predictor, reqs, str(tmp_path / "out3"), depth=2)
    )
    assert [r["id"] for r in resps] == ["a", "bad", "worse", "b"]
    assert "error" not in resps[0] and "error" not in resps[3]
    assert "missing.png" in resps[1]["error"]
    assert "image" in resps[2]["error"]


def test_serve_requests_rejects_unknown_artifact(predictor, tmp_path):
    with pytest.raises(ValueError, match="unknown artifacts"):
        list(
            serve_requests(
                predictor, [], str(tmp_path / "o"), artifacts="depth,gif"
            )
        )


def test_serve_stdio_protocol(predictor, tmp_path):
    paths = _frames(tmp_path, 2)
    lines = [
        json.dumps({"id": 1, "image": paths[0]}),
        "not json at all {",
        "",  # blank lines are skipped
        json.dumps({"id": 2, "image": paths[1], "output": "renamed"}),
    ]
    stdin = _io.StringIO("\n".join(lines) + "\n")
    stdout = _io.StringIO()
    n = serve_stdio(
        predictor, str(tmp_path / "out4"), depth=2, stdin=stdin, stdout=stdout
    )
    out_lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert out_lines[0]["ready"] is True
    assert out_lines[0]["pipeline"] == "mono"
    assert n == 3  # 2 frames + 1 malformed-line error
    assert [r.get("id") for r in out_lines[1:]] == [1, None, 2]
    assert "malformed JSON" in out_lines[2]["error"]
    assert out_lines[3]["output"].endswith("renamed_depth.npy")


def test_serve_stereo_pair(tmp_path):
    cfg = configs.get("stereo_256x512_b4")
    cfg = dataclasses.replace(
        cfg,
        stereo=dataclasses.replace(cfg.stereo, height=32, width=64, max_disp=32),
    )
    pred = api.load_weights(None, cfg, seed=0)
    paths = _frames(tmp_path, 2)
    reqs = [{"id": 0, "left": paths[0], "right": paths[1]},
            {"id": 1, "left": paths[0]}]
    resps = list(
        serve_requests(pred, reqs, str(tmp_path / "out5"), artifacts="disp")
    )
    assert "error" not in resps[0]
    assert os.path.exists(os.path.join(str(tmp_path / "out5"), "f0_disp.npy"))
    assert "right" in resps[1]["error"]


def test_serve_b64_inline_image(predictor, tmp_path):
    """Remote-client form: image file bytes inline as base64 — same
    depth map as the path form."""
    import base64

    paths = _frames(tmp_path, 1)
    with open(paths[0], "rb") as f:
        b64 = base64.b64encode(f.read()).decode("ascii")
    out = str(tmp_path / "out_b64")
    r_path = list(
        serve_requests(predictor, [{"id": 1, "image": paths[0]}], out)
    )[0]
    r_b64 = list(
        serve_requests(predictor, [{"id": 2, "image_b64": b64}], out)
    )[0]
    assert "error" not in r_b64, r_b64
    d1 = np.load(os.path.join(out, "f0_depth.npy"))
    d2 = np.load(r_b64["output"])
    np.testing.assert_array_equal(d1, d2)


def test_serve_b64_monotonic_stems(predictor, tmp_path):
    """id-less inline requests get per-request monotonic artifact stems
    — a fixed stem would let request i+1 overwrite request i's files
    before the client reads the response (ADVICE r4)."""
    import base64

    paths = _frames(tmp_path, 1)
    with open(paths[0], "rb") as f:
        b64 = base64.b64encode(f.read()).decode("ascii")
    out = str(tmp_path / "out_stems")
    resps = list(
        serve_requests(
            predictor, [{"image_b64": b64}, {"image_b64": b64}], out, depth=2
        )
    )
    outputs = [r["output"] for r in resps]
    assert outputs[0] != outputs[1]
    assert outputs[0].endswith("frame_000000_depth.npy")
    assert outputs[1].endswith("frame_000001_depth.npy")
    assert all(os.path.exists(o) for o in outputs)


def _tcp_server(predictor, tmp_path, **kw):
    """Start serve_tcp on an ephemeral port in a thread; return
    (port, thread, served_list)."""
    import threading

    from scenedepthestimation_tpu.serve import serve_tcp

    got_port = []
    ready = threading.Event()

    def _ready(p):
        got_port.append(p)
        ready.set()

    served = []
    t = threading.Thread(
        target=lambda: served.append(
            serve_tcp(
                predictor,
                str(tmp_path / "out_tcp_rb"),
                port=0,
                depth=2,
                ready_cb=_ready,
                **kw,
            )
        )
    )
    t.start()
    assert ready.wait(timeout=30)
    return got_port[0], t, served


def test_serve_tcp_hung_client_times_out(predictor, tmp_path):
    """A client that connects and goes silent is disconnected after the
    idle timeout; the NEXT connection is served normally (VERDICT r4
    weak-#2: a dead client must not stall the server forever)."""
    import socket

    paths = _frames(tmp_path, 1)
    port, t, served = _tcp_server(
        predictor, tmp_path, max_connections=2, timeout=1.0
    )
    # Connection 1: hangs (never sends a request). The server must time
    # out on its own — the client keeps the socket open throughout.
    hung = socket.create_connection(("127.0.0.1", port), timeout=30)
    hung_rf = hung.makefile("r", encoding="utf-8")
    assert json.loads(hung_rf.readline())["ready"] is True
    # Connection 2: a normal round trip, proving the server moved on.
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
        rf = s.makefile("r", encoding="utf-8")
        wf = s.makefile("w", encoding="utf-8")
        assert json.loads(rf.readline())["ready"] is True
        wf.write(json.dumps({"id": 9, "image": paths[0]}) + "\n")
        wf.flush()
        s.shutdown(socket.SHUT_WR)
        assert json.loads(rf.readline())["id"] == 9
    hung.close()
    t.join(timeout=60)
    assert not t.is_alive()
    assert served == [1]  # only the live connection's request


def test_serve_tcp_oversized_request_rejected(predictor, tmp_path):
    """A request line beyond max_request_bytes gets one error response
    and the connection is closed (the stream cannot be resynchronized
    without reading the oversized payload)."""
    import socket

    port, t, served = _tcp_server(
        predictor, tmp_path, max_connections=1, timeout=10.0,
        max_request_bytes=1024,
    )
    with socket.create_connection(("127.0.0.1", port), timeout=30) as s:
        rf = s.makefile("r", encoding="utf-8")
        wf = s.makefile("w", encoding="utf-8")
        assert json.loads(rf.readline())["ready"] is True
        # Boundary: a payload of EXACTLY max_request_bytes chars is
        # compliant — processed normally (here: a bad-image error
        # response, NOT a size rejection). Both requests go out before
        # reading: responses flush when the stream ends (pipelining
        # holds up to `depth` responses in flight).
        req = json.dumps({"id": 0, "image_b64": "A" * 900})
        req += " " * (1024 - len(req))  # pad payload to exactly 1024
        wf.write(req + "\n")
        wf.write(json.dumps({"id": 1, "image_b64": "A" * 4096}) + "\n")
        wf.flush()
        resp0 = json.loads(rf.readline())
        assert resp0["id"] == 0
        assert "max_request_bytes" not in resp0.get("error", "")
        resp1 = json.loads(rf.readline())
        assert "max_request_bytes" in resp1["error"]
        assert rf.readline() == ""  # server closed the connection
    t.join(timeout=60)
    assert not t.is_alive()


def test_serve_tcp_round_trip(predictor, tmp_path):
    """TCP mode: stdio protocol over a socket (path + b64 requests,
    ready line, in-order responses, connection count bound)."""
    import base64
    import socket
    import threading

    from scenedepthestimation_tpu.serve import serve_tcp

    paths = _frames(tmp_path, 2)
    with open(paths[1], "rb") as f:
        b64 = base64.b64encode(f.read()).decode("ascii")

    got_port = []
    ready = threading.Event()

    def _ready(p):
        got_port.append(p)
        ready.set()

    served = []
    t = threading.Thread(
        target=lambda: served.append(
            serve_tcp(
                predictor,
                str(tmp_path / "out_tcp"),
                port=0,
                depth=2,
                max_connections=1,
                ready_cb=_ready,
            )
        )
    )
    t.start()
    assert ready.wait(timeout=30)
    with socket.create_connection(("127.0.0.1", got_port[0]), timeout=30) as s:
        rf = s.makefile("r", encoding="utf-8")
        wf = s.makefile("w", encoding="utf-8")
        hello = json.loads(rf.readline())
        assert hello["ready"] is True and hello["pipeline"] == "mono"
        wf.write(json.dumps({"id": 1, "image": paths[0]}) + "\n")
        wf.write(json.dumps({"id": 2, "image_b64": b64}) + "\n")
        wf.flush()
        s.shutdown(socket.SHUT_WR)  # end of request stream
        r1 = json.loads(rf.readline())
        r2 = json.loads(rf.readline())
    t.join(timeout=60)
    assert not t.is_alive()
    assert [r1["id"], r2["id"]] == [1, 2]
    assert "error" not in r1 and "error" not in r2
    assert served == [2]
    assert os.path.exists(r1["output"]) and os.path.exists(r2["output"])
