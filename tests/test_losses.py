"""Loss parity vs. torch oracles (written from the documented behavior)."""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from lavt_rs_tpu import losses as L
from lavt_rs_tpu.metrics import batch_iou, SegMetrics


def _mk(rng, b=2, h=9, w=9):
    logits = rng.standard_normal((b, h, w, 2)).astype(np.float32)
    target = (rng.random((b, h, w)) > 0.6).astype(np.int64)
    return logits, target


def test_cross_entropy_matches_torch(rng):
    logits, target = _mk(rng)
    got = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(target)))
    want = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(target),
        weight=torch.tensor([0.9, 1.1])).item()
    assert abs(got - want) < 1e-5


def test_dice_matches_oracle(rng):
    logits, target = _mk(rng)
    got = float(L.multiclass_dice_loss(jnp.asarray(logits),
                                       jnp.asarray(target)))
    # torch oracle with the reference's p^2 cardinality quirk
    p = torch.softmax(torch.from_numpy(logits.transpose(0, 3, 1, 2)), 1)
    t1 = F.one_hot(torch.from_numpy(target), 2).permute(0, 3, 1, 2).float()
    inter = (p * t1).sum((2, 3))
    card = (p * p + t1).sum((2, 3))
    dice = 2 * inter / (card + 1e-6)
    loss_c = (1 - dice).mean(0)
    want = ((loss_c[1] + loss_c[0]) / 2).item()
    assert abs(got - want) < 1e-5


def test_dice_focal_finite(rng):
    logits, target = _mk(rng)
    v = float(L.dice_focal_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert np.isfinite(v) and v > 0


def test_dice_boundary_finite(rng):
    logits, target = _mk(rng, h=16, w=16)
    v = float(L.dice_boundary_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert np.isfinite(v) and v > 0


def test_boundary_loss_zero_for_perfect_prediction():
    target = np.zeros((1, 16, 16), np.int64)
    target[0, 4:12, 4:12] = 1
    logits = np.zeros((1, 16, 16, 2), np.float32)
    logits[..., 1] = np.where(target[0] == 1, 50.0, -50.0)
    v = float(L.boundary_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert v < 1e-3


def test_batch_iou_and_accumulator(rng):
    logits, target = _mk(rng, b=4)
    i, u = batch_iou(jnp.asarray(logits), jnp.asarray(target))
    pred = logits.argmax(-1)
    for b in range(4):
        ii = np.logical_and(pred[b], target[b]).sum()
        uu = np.logical_or(pred[b], target[b]).sum()
        assert abs(float(i[b]) - ii) < 1e-5
        assert abs(float(u[b]) - uu) < 1e-5

    m = SegMetrics()
    m.update(np.asarray(i), np.asarray(u))
    s = m.summary()
    assert 0 <= s["mIoU"] <= 100 and 0 <= s["oIoU"] <= 100
    assert s["P@0.5"] >= s["P@0.9"]


def test_segmetrics_shard_merge_matches_single():
    """Multi-host eval sharding: merging per-shard sufficient statistics
    (SegMetrics.stats_row/merge_stats, used by eval/refcoco_eval.py's
    process sharding) reproduces the single-accumulator summary exactly
    — oIoU, mIoU, every P@K, and n."""
    import numpy as np

    rng = np.random.default_rng(7)
    inters = rng.uniform(0, 100, 37)
    unions = inters + rng.uniform(0, 100, 37)
    unions[5] = inters[5] = 0.0  # zero-union guard case

    whole = SegMetrics()
    whole.update(inters, unions)

    shards = [SegMetrics() for _ in range(3)]
    for i, (a, b) in enumerate(zip(inters, unions)):
        shards[i % 3].update([a], [b])
    rows = np.stack([s.stats_row() for s in shards])
    merged = SegMetrics()
    merged.merge_stats(rows)

    assert merged.n == whole.n
    sw, sm = whole.summary(), merged.summary()
    for k in sw:
        np.testing.assert_allclose(sm[k], sw[k], rtol=1e-12, err_msg=k)
