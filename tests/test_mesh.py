"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fasterrcnn_tpu.parallel import mesh as mesh_lib


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh(8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh1 = mesh_lib.make_mesh(8, tp=1)
    assert mesh1.shape == {"dp": 8, "tp": 1}


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    assert mesh_lib.param_spec("roi_head/fc1/kernel") == P(None, "tp")
    assert mesh_lib.param_spec("roi_head/fc2/kernel") == P("tp")
    assert mesh_lib.param_spec("feature_extractor/block1_conv1/kernel") == P()
    # Optimizer-state trace paths resolve to the same specs as their params.
    assert (
        mesh_lib.param_spec("inner_states/decayed/inner_state/0/0/trace/roi_head/fc1/kernel")
        == P(None, "tp")
    )


def test_engine_trains_on_mesh():
    """Two sharded train steps + one sharded eval through the Engine."""
    from fasterrcnn_tpu.config import TrainConfig
    from fasterrcnn_tpu.data.synthetic import SyntheticDataset
    from fasterrcnn_tpu.engine import Engine
    from tests.test_model import tiny_config, CANVAS_H, CANVAS_W

    mesh = mesh_lib.make_mesh(8, tp=2)
    engine = Engine(
        tiny_config(),
        TrainConfig(batch_size=8),
        seed=0,
        init_canvas=(CANVAS_H, CANVAS_W),
        mesh=mesh,
    )
    # fc1 kernel is tp-sharded across devices.
    fc1 = engine.params["roi_head"]["fc1"]["kernel"]
    assert len(fc1.sharding.device_set) == 8
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "tp")

    # 12 samples at bs=8: one full batch + one residue padded to 8 — the
    # padded residue must shard along dp and reuse the compiled program.
    data = SyntheticDataset(num_samples=12, height=120, width=150, seed=0)
    stats = engine.train_epoch(data, batch_size=8, progress=False)
    means = stats.means()
    assert np.isfinite(sum(means.values()))
    assert means["detector_class"] > 0
    (step,) = engine._train_steps.values()
    assert step._cache_size() == 1

    mAP = engine.evaluate(
        SyntheticDataset(num_samples=8, height=120, width=150, seed=1),
        batch_size=8,
        progress=False,
    )
    assert 0.0 <= mAP <= 100.0


def test_engine_rejects_indivisible_batch_size():
    from fasterrcnn_tpu.config import TrainConfig
    from fasterrcnn_tpu.data.synthetic import SyntheticDataset
    from fasterrcnn_tpu.engine import Engine
    from tests.test_model import tiny_config, CANVAS_H, CANVAS_W

    engine = Engine(
        tiny_config(),
        TrainConfig(batch_size=6),
        seed=0,
        init_canvas=(CANVAS_H, CANVAS_W),
        mesh=mesh_lib.make_mesh(8, tp=2),  # dp=4 does not divide 6
    )
    data = SyntheticDataset(num_samples=6, height=120, width=150, seed=0)
    with pytest.raises(ValueError, match="divisible"):
        engine.train_epoch(data, batch_size=6, progress=False)


def test_adam_trains_on_mesh():
    """GSPMD must propagate shardings through Adam's mu/nu state (the round-1
    claim was only asserted for SGD momentum)."""
    from fasterrcnn_tpu.config import TrainConfig
    from fasterrcnn_tpu.data.synthetic import SyntheticDataset
    from fasterrcnn_tpu.engine import Engine
    from tests.test_model import tiny_config, CANVAS_H, CANVAS_W

    engine = Engine(
        tiny_config(),
        TrainConfig(batch_size=8, optimizer="adam", learning_rate=1e-4),
        seed=0,
        init_canvas=(CANVAS_H, CANVAS_W),
        mesh=mesh_lib.make_mesh(8, tp=2),
    )
    data = SyntheticDataset(num_samples=8, height=120, width=150, seed=0)
    stats = engine.train_epoch(data, batch_size=8, progress=False)
    assert np.isfinite(sum(stats.means().values()))


def test_load_weights_preserves_mesh_sharding(tmp_path):
    """load_weights / set_params must re-apply mesh placement — a host-side
    tree would silently lose the tp-split and replicate the 103M-param fc1."""
    from fasterrcnn_tpu.config import TrainConfig
    from fasterrcnn_tpu.engine import Engine
    from tests.test_model import tiny_config, CANVAS_H, CANVAS_W

    engine = Engine(
        tiny_config(),
        TrainConfig(batch_size=8),
        seed=0,
        init_canvas=(CANVAS_H, CANVAS_W),
        mesh=mesh_lib.make_mesh(8, tp=2),
    )
    path = str(tmp_path / "w.msgpack")
    engine.save_weights(path)
    engine.load_weights(path)
    fc1 = engine.params["roi_head"]["fc1"]["kernel"]
    assert fc1.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    assert len(fc1.sharding.device_set) == 8
    # Optimizer state placement is explicit too (momentum trace of fc1).
    leaves = jax.tree_util.tree_leaves_with_path(engine.opt_state)
    fc1_traces = [
        x for p, x in leaves
        if "fc1" in jax.tree_util.keystr(p) and "kernel" in jax.tree_util.keystr(p)
    ]
    assert fc1_traces and all(
        t.sharding.spec == jax.sharding.PartitionSpec(None, "tp") for t in fc1_traces
    )
