"""Pipelined feed + resumable batch inference tests (SURVEY §5.2, §5.3)."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from scenedepthestimation_tpu.api import load_weights
from scenedepthestimation_tpu.configs import MonoConfig, RunConfig, StereoConfig
from scenedepthestimation_tpu.infer import predict_files
from scenedepthestimation_tpu.parallel.feed import PipelinedFeed
from scenedepthestimation_tpu.parallel.mesh import make_mesh

TINY_MONO = RunConfig(
    name="tiny_mono_feed", pipeline="mono", batch_size=2,
    mono=MonoConfig(height=64, width=128),
)


def test_feed_yields_device_batches_in_order():
    batches = [{"images": np.full((2, 4, 4, 3), i, np.uint8), "n_real": 2}
               for i in range(5)]
    out = list(PipelinedFeed(iter(batches)))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert int(np.asarray(b["images"])[0, 0, 0, 0]) == i
        assert isinstance(b["images"], jax.Array)
        assert b["n_real"] == 2


def test_feed_shards_on_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    batches = [{"images": np.zeros((8, 4, 4, 3), np.uint8)}]
    (out,) = list(PipelinedFeed(iter(batches), mesh=mesh))
    assert len(out["images"].sharding.device_set) == 8


def test_feed_propagates_producer_error():
    def bad():
        yield {"x": np.zeros((2,))}
        raise RuntimeError("decode exploded")

    feed = PipelinedFeed(bad())
    it = iter(feed)
    next(it)
    with pytest.raises(RuntimeError, match="decode exploded"):
        next(it)


def _write_frames(tmp_path, n):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = str(tmp_path / f"frame_{i:03d}.png")
        Image.fromarray(
            rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
        ).save(p)
        paths.append(p)
    return paths


def test_predict_files_and_resume(tmp_path):
    predictor = load_weights(None, TINY_MONO, seed=0)
    paths = _write_frames(tmp_path, 5)
    out_dir = str(tmp_path / "out")

    stats = predict_files(predictor, paths, out_dir, batch_size=2)
    assert stats == {"written": 5, "skipped": 0}
    outs = sorted(f for f in os.listdir(out_dir) if f.endswith("_depth.npy"))
    assert len(outs) == 5
    d = np.load(os.path.join(out_dir, outs[0]))
    assert d.shape == (64, 128)

    # Journal exists and a rerun skips everything (SURVEY §5.3).
    with open(os.path.join(out_dir, ".done.jsonl")) as f:
        journaled = [json.loads(l) for l in f]
    assert sum(len(j["files"]) for j in journaled) == 5
    stats2 = predict_files(predictor, paths, out_dir, batch_size=2)
    assert stats2 == {"written": 0, "skipped": 5}

    # Partial journal → only the missing files are redone.
    lines = open(os.path.join(out_dir, ".done.jsonl")).readlines()
    with open(os.path.join(out_dir, ".done.jsonl"), "w") as f:
        f.writelines(lines[:-1])
    stats3 = predict_files(predictor, paths, out_dir, batch_size=2)
    assert stats3["written"] >= 1 and stats3["written"] <= 2


def test_train_batch_transfer_shards_and_replicates():
    """train_batch_transfer (VERDICT r4 weak-#1): batch-leading host
    arrays shard over the mesh batch axis; the augmentation rng key
    replicates EVEN when its leading axis numerically equals the batch
    size (a sharded PRNG key would be semantically wrong)."""
    import jax
    import numpy as np

    from scenedepthestimation_tpu.parallel.feed import train_batch_transfer
    from scenedepthestimation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2)
    transfer = train_batch_transfer(mesh, batch_size=2)
    batch = {
        "image": np.zeros((2, 8, 16, 3), np.uint8),
        "K": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
        "rng": jax.random.PRNGKey(0),  # shape (2,) — collides with b!
    }
    out = transfer(batch)
    assert len(out["image"].sharding.device_set) == 2
    assert not out["image"].sharding.is_fully_replicated
    assert not out["K"].sharding.is_fully_replicated
    assert out["rng"].sharding.is_fully_replicated
    np.testing.assert_array_equal(
        np.asarray(out["rng"]), np.asarray(jax.random.PRNGKey(0))
    )

    # single-device form: plain device_put, jax arrays pass through
    t1 = train_batch_transfer(None, batch_size=2)
    out1 = t1(batch)
    assert isinstance(out1["image"], jax.Array)
