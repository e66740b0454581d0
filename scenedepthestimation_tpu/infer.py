"""Resumable batch inference over file lists (SURVEY C19 batch path +
§5.3 failure recovery).

Batch inference is idempotent and restartable at file granularity: every
completed batch appends its source names to a journal
(``<out_dir>/.done.jsonl``); a rerun skips journaled files. There is no
elastic-recovery daemon to build — a crash loses at most the in-flight
batch (SURVEY §5.3).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Sequence

import numpy as np

from scenedepthestimation_tpu.api import Predictor
from scenedepthestimation_tpu.data import io
from scenedepthestimation_tpu.parallel.feed import PipelinedFeed

_JOURNAL = ".done.jsonl"


def _load_done(out_dir: str) -> set:
    done = set()
    path = os.path.join(out_dir, _JOURNAL)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    done.update(json.loads(line)["files"])
                except (json.JSONDecodeError, KeyError):
                    continue  # torn write from a crash: redo those files
    return done


def predict_files(
    predictor: Predictor,
    files: Sequence,
    out_dir: str,
    batch_size: int = 8,
    mesh=None,
    resume: bool = True,
) -> Dict[str, int]:
    """Run prediction over image paths (mono) or (left, right) path pairs
    (stereo), dumping <stem>_depth.npy per input into ``out_dir``.

    With a mesh, batches are sharded over the data axis; the feed thread
    overlaps decode + transfer with device compute.
    """
    os.makedirs(out_dir, exist_ok=True)
    stereo = predictor.cfg.pipeline == "stereo"
    done = _load_done(out_dir) if resume else set()

    def _key(item) -> str:
        return item[0] if stereo else item

    todo = [f for f in files if _key(f) not in done]
    skipped = len(files) - len(todo)

    def host_batches():
        for i in range(0, len(todo), batch_size):
            chunk = todo[i : i + batch_size]
            n_real = len(chunk)
            pad = chunk + [chunk[-1]] * (batch_size - n_real)
            if stereo:
                left = np.stack([io.load_image(l) for l, _ in pad])
                right = np.stack([io.load_image(r) for _, r in pad])
                yield {"left": left, "right": right, "n_real": n_real,
                       "files": [_key(c) for c in chunk]}
            else:
                imgs = np.stack([io.load_image(p) for p in pad])
                yield {"images": imgs, "n_real": n_real,
                       "files": list(chunk)}

    if mesh is not None:
        from scenedepthestimation_tpu.parallel.mesh import replicate_variables

        predictor.variables = replicate_variables(predictor.variables, mesh)

    written = 0
    feed = PipelinedFeed(host_batches(), mesh=mesh)
    with open(os.path.join(out_dir, _JOURNAL), "a") as journal:
        for batch in feed:
            if stereo:
                out = predictor.stereo_forward(batch["left"], batch["right"])
            else:
                out = predictor.mono_forward(batch["images"])
            depth = np.asarray(out["depth"])
            for i in range(batch["n_real"]):
                np.save(
                    os.path.join(out_dir, _output_stem(batch["files"][i]) + "_depth.npy"),
                    depth[i],
                )
                written += 1
            journal.write(json.dumps({"files": batch["files"]}) + "\n")
            journal.flush()
    return {"written": written, "skipped": skipped}


def _output_stem(path: str) -> str:
    """Output name for one input: basename stem + a short path hash.

    Basename alone collides across KITTI drives (every drive has a
    0000000005.png) — the second write would silently clobber the first
    while the journal marks both done."""
    stem = os.path.splitext(os.path.basename(path))[0]
    digest = hashlib.md5(path.encode()).hexdigest()[:8]
    return f"{stem}-{digest}"
