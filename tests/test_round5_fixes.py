"""Regression tests for the round-5 VERDICT/ADVICE items:

- explicit ``use_fused=True`` off-TPU routes through the kernel's
  interpret mode instead of lowering Mosaic on a CPU backend
  (VERDICT r4 weak item 3);
- the corrected ``neighbor_padding="mask"`` mode zero-masks dropped
  (-1) neighbors instead of the reference's wrap-to-last-row
  (VERDICT r4 item 7; reference bug data_generator.py:69);
- the encoder autotune probe measures the experiment's ACTUAL
  (batch, 1+K) shape (VERDICT r4 item 4);
- RAT_AB_OVERRIDE runs are self-identifying in the result JSON
  (ADVICE r4).
"""

import numpy as np
import pytest

from rat_tpu.retrieval.bm25 import bm25_topk_retrieval
from tests.test_trainer import FakeGen, _trainer


def test_use_fused_override_off_tpu_runs_interpret(rng):
    """use_fused=True on a CPU backend must produce the XLA path's
    exact results (via Pallas interpret mode), not crash or lower
    Mosaic for a backend that cannot run it."""
    import jax
    assert jax.default_backend() != "tpu"
    db = rng.randint(0, 12, (60, 3))
    q = rng.randint(0, 12, (9, 3))
    ref = bm25_topk_retrieval(db, q, topK=3, qry_batch_size=4)
    forced = bm25_topk_retrieval(db, q, topK=3, qry_batch_size=4,
                                 use_fused=True)
    np.testing.assert_array_equal(ref.indices, forced.indices)
    np.testing.assert_allclose(ref.values, forced.values, rtol=1e-6)
    np.testing.assert_array_equal(ref.lens, forced.lens)


class ShortRowGen(FakeGen):
    """FakeGen with some dropped (-1) neighbor slots (lens < K)."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.retr_indices[::4, -1] = -1
        self.retr_lens = (self.retr_indices >= 0).sum(-1)


def test_neighbor_padding_mask_differs_exactly_on_short_rows(
        tiny_feature_map, demo_params, tmp_path):
    gen = ShortRowGen(n=64, K=2, batch_size=32, shuffle=False, seed=3)
    preds = {}
    for mode in ("wrap", "mask"):
        tr = _trainer(tiny_feature_map, demo_params, tmp_path,
                      neighbor_padding=mode)
        tr.init_state(np.zeros((2, 3, 3), np.int32),
                      np.zeros((2, 3), np.float32))
        preds[mode] = tr.predict(gen)
    short = gen.retr_lens < gen.topk
    assert short.any() and (~short).any()
    # identical init => full-length rows agree to float-fusion noise
    # (the mask multiply changes XLA's fusion choices by ~1 ULP); short
    # rows see a zeroed slot instead of the pool's last row and must
    # all move by far more than that
    np.testing.assert_allclose(preds["wrap"][~short], preds["mask"][~short],
                               atol=1e-6)
    assert np.min(np.abs(preds["wrap"][short] - preds["mask"][short])) > 1e-4


def test_neighbor_padding_mask_trains(tiny_feature_map, demo_params,
                                      tmp_path):
    """The corrected mode must run end to end through fit/evaluate."""
    train = ShortRowGen(n=256, K=2, batch_size=64, seed=0)
    valid = ShortRowGen(n=256, K=2, batch_size=64, seed=0, shuffle=False)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path,
                  neighbor_padding="mask", embedding_regularizer=0,
                  learning_rate=5e-3)
    tr.fit(train, validation_data=valid, epochs=3)
    logs = tr.evaluate(valid)
    assert np.isfinite(logs["logloss"])


def test_encoder_probe_shape_matches_fit_shapes(tiny_feature_map,
                                                demo_params, tmp_path):
    """The autotune probe must time the very grid shape fit() trains at
    (generator batch size, 1 + generator topK), not a hardcoded one."""
    gen = FakeGen(n=192, K=4, batch_size=96)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path)
    tr.fit(gen, validation_data=FakeGen(n=96, K=4, batch_size=96,
                                        shuffle=False), epochs=1)
    assert tr._encoder_probe_shape() == (gen.batch_size, 1 + gen.topk)
    # and those are exactly the train-step shapes
    idx, valid = next(gen.epoch_index_batches())
    assert idx.shape[0] == tr._encoder_probe_shape()[0]
    assert gen.neighbor_gather_indices().shape[1] + 1 == \
        tr._encoder_probe_shape()[1]


def test_ab_override_stamped_into_results(monkeypatch):
    from rat_tpu.cli.benchmark import _tag_ab_override
    monkeypatch.delenv("RAT_AB_OVERRIDE", raising=False)
    assert "ab_override" not in _tag_ab_override({"metric": "m"})
    monkeypatch.setenv("RAT_AB_OVERRIDE", '{"depth": 1}')
    assert _tag_ab_override({"metric": "m"})["ab_override"] == '{"depth": 1}'


def test_neighbor_padding_unknown_value_rejected(tiny_feature_map,
                                                 demo_params, tmp_path):
    with pytest.raises(ValueError, match="neighbor_padding"):
        _trainer(tiny_feature_map, demo_params, tmp_path,
                 neighbor_padding="masked")


def test_probe_shape_mismatch_rebuilds_steps(tiny_feature_map, demo_params,
                                             tmp_path):
    """evaluate()/predict() before fit() must not latch the autotune
    winner at the wrong grid shape: fit() re-resolves and rebuilds when
    the probed shape differs from the generator's actual one."""
    gen = FakeGen(n=96, K=2, batch_size=48, shuffle=False)
    tr = _trainer(tiny_feature_map, demo_params, tmp_path)
    tr.init_state(np.zeros((2, 3, 3), np.int32), np.zeros((2, 3), np.float32))
    tr.predict(gen)                       # builds the steps pre-fit
    first_step = tr._jit_train_step
    # simulate an accelerator probe having resolved at the default shape
    tr._probe_resolved_shape = (4096, 3)
    tr.fit(gen, validation_data=gen, epochs=1)
    assert tr._jit_train_step is not first_step
    # stale shape cleared (re-set only when a probe actually runs, which
    # the CPU backend skips) so the rebuild cannot loop
    assert tr._probe_resolved_shape in (None, tr._encoder_probe_shape())
    # and a matching shape does NOT rebuild
    second_step = tr._jit_train_step
    tr._probe_resolved_shape = tr._encoder_probe_shape()
    tr.fit(gen, validation_data=gen, epochs=1)
    assert tr._jit_train_step is second_step


def test_exm_trailing_window_padding_matches_unpadded(rng, monkeypatch):
    """Tiny per-dispatch budget forces many scored windows incl. a
    padded trailing one; results must equal the single-dispatch run."""
    import rat_tpu.retrieval.bm25 as bm25
    db = np.stack([rng.randint(0, 3, 400),
                   rng.randint(0, 50, 400),
                   rng.randint(0, 40, 400)], axis=1)
    q = db[rng.randint(0, 400, 60)]
    kw = dict(exact_match_col_indices=[0], qry_batch_size=8, topK=4)
    ref = bm25.bm25_topk_retrieval(db, q, **kw)
    monkeypatch.setattr(bm25, "_EXM_MAX_SCORES_PER_DISPATCH", 3 * 8 * 256.0)
    forced = bm25.bm25_topk_retrieval(db, q, **kw)
    np.testing.assert_array_equal(ref.indices, forced.indices)
    np.testing.assert_array_equal(ref.values, forced.values)
    np.testing.assert_array_equal(ref.lens, forced.lens)


def test_chip_health_skips_device_probes_off_tpu():
    from rat_tpu.cli.chip_health import collect
    out = collect()
    assert out["platform"] != "tpu"
    assert out["healthy"] is None and "note" in out
