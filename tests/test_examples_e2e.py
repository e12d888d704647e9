"""End-to-end example integration tests (debug scale, CPU mesh).

Drives the actual experiment entry points (setup_training + run_training)
for DW4 (energies + forward ESS path) and ALDP (h5 loading, per-atom-index
features, EMA path) at tiny scale.
"""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

from ecnf_tpu.targets.data import load_dw4, load_aldp
from ecnf_tpu.targets.energies import double_well_log_prob
from ecnf_tpu.training.config import load_config
from ecnf_tpu.training.loop import run_training
from ecnf_tpu.training.setup import setup_training


def _tiny_overrides(tmp_path, extra=()):
    return [
        "training.save=true",
        f"training.save_dir={tmp_path}",
        "training.batch_size=8",
        "training.eval_batch_size=9",
        "training.n_training_iter=2",
        "training.train_set_size=40",
        "training.test_set_size=16",
        "training.plot_batch_size=8",
        "training.n_checkpoints=1",
        "training.n_eval=1",
        "flow.network.mlp_units=[8]",
        "flow.network.n_blocks_egnn=1",
        "flow.network.n_invariant_feat_hidden=4",
        "flow.network.time_embedding_dim=4",
        *extra,
    ]


@pytest.mark.slow
class TestExamplesE2E:
    def test_dw4_end_to_end(self, tmp_path):
        cfg = load_config(
            str(REPO / "examples/configs/dw4.yaml"),
            overrides=_tiny_overrides(tmp_path),
        )

        def load_dataset(train_size, test_size):
            train, valid, test = load_dw4(train_size)
            return train, test[:test_size]

        tc = setup_training(cfg, load_dataset, target_log_prob_fn=double_well_log_prob)
        logger, state = run_training(tc)
        hist = logger.history if hasattr(logger, "history") else None
        assert hist is not None
        assert np.isfinite(hist["loss"]).all()
        assert "forward_ess" in hist
        assert (tmp_path / "model_checkpoints").exists()
        assert any((tmp_path / "plots").iterdir())

    def test_aldp_end_to_end_with_ema(self, tmp_path):
        h5 = REPO / "data" / "aldp_500K_train_mini.h5"
        if not h5.exists():
            pytest.skip("aldp h5 missing")
        cfg = load_config(
            str(REPO / "examples/configs/aldp.yaml"),
            overrides=_tiny_overrides(
                tmp_path,
                extra=(
                    "training.use_ema=true",
                    "training.eval_exact_log_prob=false",
                    "training.train_set_size=32",
                    "training.test_set_size=8",
                    "training.eval_batch_size=4",
                ),
            ),
        )

        def load_dataset(train_size, test_size):
            train, valid, test = load_aldp(
                train_path=str(h5), val_path=str(h5), test_path=str(h5),
                train_n_points=train_size,
            )
            return train, test[:test_size]

        tc = setup_training(cfg, load_dataset)
        logger, state = run_training(tc)
        assert state.ema_params is not None
        # EMA params must differ from raw params after training.
        p = jax.tree_util.tree_leaves(state.params)[0]
        e = jax.tree_util.tree_leaves(state.ema_params)[0]
        assert not np.allclose(np.asarray(p), np.asarray(e))
        assert np.isfinite(logger.history["loss"]).all()
        # 22-atom per-index features drove a 22-entry embedding.
        emb = state.params["params"]["Embed_0"]["embedding"]
        assert emb.shape[0] == 22
