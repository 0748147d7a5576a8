"""Utility subsystem tests: config, profiling, checkpoint/resume."""

import numpy as np
import jax
import jax.numpy as jnp

from sgl_tpu.graph import symmetric_normalized_weights
from sgl_tpu.kernels import spmm
from sgl_tpu.ops.graph_ops import k_hop_propagate
from sgl_tpu.tasks.utils import adam_l2, init_train_state
from sgl_tpu.utils import (
    HopCheckpointer,
    StageTimer,
    TrainConfig,
    device_with_max_free_mem,
    load_train_state,
    save_train_state,
)
from tests.conftest import random_graph


def test_train_config_roundtrip():
    cfg = TrainConfig(lr=0.05, epochs=10)
    assert TrainConfig.from_json(cfg.to_json()) == cfg
    cfg2 = TrainConfig.from_args(["--lr", "0.2", "--epochs", "7"])
    assert cfg2.lr == 0.2 and cfg2.epochs == 7


def test_stage_timer():
    t = StageTimer()
    with t.stage("pre"):
        pass
    with t.stage("train"):
        pass
    with t.stage("train"):
        pass
    assert t.counts["train"] == 2
    assert t.total("pre", "train") >= 0
    assert "pre=" in t.summary()


def test_hop_checkpoint_resume(tmp_path):
    g = random_graph(n=50, seed=2)
    adj = symmetric_normalized_weights(g)
    x = jnp.asarray(g.x)
    ck = HopCheckpointer(str(tmp_path / "hops"))
    full = np.asarray(ck.propagate_resumable(adj, x, 3))
    want = np.asarray(k_hop_propagate(adj, x, 3))
    np.testing.assert_allclose(full, want, rtol=1e-5, atol=1e-6)
    # simulate a crash after hop 2: drop hop 3, resume recomputes only hop 3
    import os
    os.remove(str(tmp_path / "hops" / "hop_3.npy"))
    assert ck.last_completed_hop() == 2
    resumed = np.asarray(ck.propagate_resumable(adj, x, 3))
    np.testing.assert_allclose(resumed, want, rtol=1e-5, atol=1e-6)


def test_train_state_checkpoint(tmp_path):
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros(2)}
    tx = adam_l2(0.1, 0.0)
    state = init_train_state(jax.random.PRNGKey(0), params, tx)
    path = str(tmp_path / "ck" / "state.pkl")
    save_train_state(path, state)
    restored = load_train_state(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_chooser():
    d = device_with_max_free_mem()
    assert d is not None


def test_warmup_schedule():
    from sgl_tpu.tasks.utils import warmup_lr_schedule, adam_l2_warmup

    sched = warmup_lr_schedule(0.1, warmup_epochs=50)
    assert abs(float(sched(0)) - 0.1 / 50) < 1e-6
    assert abs(float(sched(24)) - 0.05) < 1e-6
    assert abs(float(sched(49)) - 0.1) < 1e-6
    assert abs(float(sched(500)) - 0.1) < 1e-6
    # optimizer applies warmup
    import jax, jax.numpy as jnp, optax
    tx = adam_l2_warmup(0.1, 0.0, warmup_epochs=10)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    u1, state = tx.update(g, state, params)
    assert float(jnp.abs(u1["w"]).max()) < 0.02  # warmed-down first step


def test_memmap_hop_sink_bf16_roundtrip(tmp_path):
    """bf16 hop stores round-trip through .npy: the format cannot encode
    ml_dtypes types (they load back as void "|V2"), so the sink stores
    raw uint16 bits and views them back — zero-copy on the memmap."""
    import ml_dtypes
    import numpy as np

    from sgl_tpu.utils import MemmapHopSink

    bf16 = np.dtype(ml_dtypes.bfloat16)
    sink = MemmapHopSink(str(tmp_path), num_nodes=10, feat_dim=4,
                         prop_steps=1, dtype=bf16)
    a0 = np.arange(40, dtype=np.float32).reshape(10, 4).astype(bf16)
    a1 = (a0.astype(np.float32) * 0.5).astype(bf16)
    sink(0, a0)
    sink(1, a1)
    hh = sink.hops()
    rows = np.asarray(hh.rows(np.asarray([1, 3])), np.float32)
    np.testing.assert_array_equal(rows[0], a0[[1, 3]].astype(np.float32))
    np.testing.assert_array_equal(rows[1], a1[[1, 3]].astype(np.float32))
