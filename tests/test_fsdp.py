"""2-D mesh (data x fsdp) parameter sharding for the large-backbone stretch
configs (SURVEY §2.9 note: optional 2-D mesh for ViT-B/ImageNet)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import semireward_tpu  # noqa: F401
from semireward_tpu.config import get_config
from semireward_tpu.registry import ALGORITHMS, NETS
from semireward_tpu.core.step import init_train_state, make_train_step
from semireward_tpu.parallel import mesh as mesh_lib


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_fsdp_sharded_step(rs):
    mesh = mesh_lib.build_mesh((2, 4), ("data", "fsdp"))
    cfg = get_config(dict(
        algorithm="fixmatch", net="vit_tiny_patch2_32", num_classes=4,
        batch_size=8, uratio=1, num_train_iter=20, lr=1e-4, optim="AdamW",
        ema_m=0.0, img_size=32, compute_dtype="float32",
        mesh_shape=(2, 4), mesh_axes=("data", "fsdp")))
    model = NETS.get("vit_tiny_patch2_32")(num_classes=4, dtype=jnp.float32,
                                           depth=2)
    alg = ALGORITHMS.get("fixmatch")(cfg, {"ulb_dest_len": 32})
    state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = make_train_step(cfg, alg, model, tx)

    param_sh = mesh_lib.fsdp_param_sharding(mesh, state.params,
                                            min_size=2048)
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data"))
    state = state.replace(
        params=jax.device_put(state.params, param_sh),
        ema_params=jax.device_put(state.ema_params, param_sh))
    state = state.replace(
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        algo=jax.device_put(state.algo, rep),
        rng=jax.device_put(state.rng, rep),
        step=jax.device_put(state.step, rep))

    B = 8
    batch = {
        "x_lb": jax.device_put(rs.randn(B, 32, 32, 3).astype(np.float32), dat),
        "y_lb": jax.device_put(rs.randint(0, 4, B), dat),
        "x_ulb_w": jax.device_put(rs.randn(B, 32, 32, 3).astype(np.float32), dat),
        "x_ulb_s": jax.device_put(rs.randn(B, 32, 32, 3).astype(np.float32), dat),
        "idx_ulb": jax.device_put(np.arange(B, dtype=np.int32), dat),
    }
    jstep = jax.jit(step)
    state, m = jstep(state, batch)
    assert np.isfinite(float(m["total_loss"]))
    # at least one large leaf actually sharded over fsdp
    sharded = False
    for leaf in jax.tree_util.tree_leaves(state.params):
        spec = leaf.sharding.spec if hasattr(leaf.sharding, "spec") else None
        if spec and any(s == "fsdp" for s in spec if s):
            sharded = True
    assert sharded


def _count_fsdp_leaves(tree):
    n = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        spec = getattr(leaf.sharding, "spec", None)
        if spec and any(s == "fsdp" for s in spec if s):
            n += 1
    return n


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_fsdp_state_sharding_covers_opt_and_ema(rs):
    """VERDICT r1 item 9: the memory win requires the EMA shadow and the
    Adam moments to shard with the params — assert the layout and that a
    jitted step preserves it."""
    mesh = mesh_lib.build_mesh((2, 4), ("data", "fsdp"))
    cfg = get_config(dict(
        algorithm="fixmatch", net="vit_tiny_patch2_32", num_classes=4,
        batch_size=8, uratio=1, num_train_iter=20, lr=1e-4, optim="AdamW",
        ema_m=0.999, img_size=32, compute_dtype="float32",
        mesh_shape=(2, 4), mesh_axes=("data", "fsdp")))
    model = NETS.get("vit_tiny_patch2_32")(num_classes=4, dtype=jnp.float32,
                                           depth=2)
    alg = ALGORITHMS.get("fixmatch")(cfg, {"ulb_dest_len": 32})
    state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    state_sh = mesh_lib.fsdp_state_sharding(mesh, state, min_size=2048)
    state = jax.device_put(state, state_sh)

    n_p = _count_fsdp_leaves(state.params)
    assert n_p > 0
    # EMA mirrors params exactly; AdamW carries mu+nu (2x the param layout)
    assert _count_fsdp_leaves(state.ema_params) == n_p
    assert _count_fsdp_leaves(state.opt_state) >= 2 * n_p
    # memory check: a sharded leaf's per-device shard is 1/4 of its rows
    for leaf in jax.tree_util.tree_leaves(state.params):
        spec = getattr(leaf.sharding, "spec", None)
        if spec and any(s == "fsdp" for s in spec if s):
            shard = leaf.addressable_shards[0].data
            assert shard.size == leaf.size // 4
            break

    dat = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    step = make_train_step(cfg, alg, model, tx)
    jstep = jax.jit(step, in_shardings=(state_sh, dat),
                    out_shardings=(state_sh, rep), donate_argnums=0)
    B = 8
    batch = {
        "x_lb": jax.device_put(rs.randn(B, 32, 32, 3).astype(np.float32), dat),
        "y_lb": jax.device_put(rs.randint(0, 4, B), dat),
        "x_ulb_w": jax.device_put(rs.randn(B, 32, 32, 3).astype(np.float32), dat),
        "x_ulb_s": jax.device_put(rs.randn(B, 32, 32, 3).astype(np.float32), dat),
        "idx_ulb": jax.device_put(np.arange(B, dtype=np.int32), dat),
    }
    state, m = jstep(state, batch)
    assert np.isfinite(float(m["total_loss"]))
    assert _count_fsdp_leaves(state.opt_state) >= 2 * n_p  # layout preserved


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_trainer_fsdp_mesh_e2e(tmp_path):
    """Trainer auto-applies the fsdp state layout when the mesh has an
    'fsdp' axis."""
    from semireward_tpu.core.trainer import Trainer
    cfg = get_config(dict(
        algorithm="fixmatch", net="vit_tiny_patch2_32", dataset="synthetic",
        num_classes=4, num_labels=16, batch_size=8, uratio=1,
        eval_batch_size=16, img_size=32, num_train_iter=2, num_eval_iter=2,
        num_log_iter=1, optim="AdamW", lr=1e-4, ema_m=0.999,
        compute_dtype="float32", mesh_shape=(2, 4),
        mesh_axes=("data", "fsdp"), save_dir=str(tmp_path)))
    cfg.extra.update(synthetic_train=64, synthetic_test=32,
                     net_kwargs=dict(depth=2))
    tr = Trainer(cfg)
    assert _count_fsdp_leaves(tr.state.params) > 0
    assert _count_fsdp_leaves(tr.state.opt_state) > 0
    res = tr.train()
    assert "eval/top-1-acc" in res
