"""One jitted train step for EVERY registered algorithm: finite losses,
state threading, step increment. The per-algorithm view contract comes from
augment_views, exactly as the Trainer wires it."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import semireward_tpu  # noqa: F401
from semireward_tpu.config import get_config
from semireward_tpu.registry import ALGORITHMS, NETS
from semireward_tpu.core.step import init_train_state, make_train_step
from semireward_tpu.data.augment import AugmentSpec, augment_views

ALL_ALGS = ["fullysupervised", "pseudolabel", "pimodel", "meanteacher", "vat",
            "mixmatch", "remixmatch", "uda", "fixmatch", "dash", "flexmatch",
            "adamatch", "crmatch", "comatch", "simmatch", "freematch",
            "softmatch", "defixmatch",
            "srpseudolabel", "srfixmatch", "srflexmatch", "srfreematch",
            "srsoftmatch"]


def build(alg_name, B=4, C_=4):
    cfg = get_config(dict(
        algorithm=alg_name, net="wrn_28_2", num_classes=C_, batch_size=B,
        uratio=1, num_train_iter=40, epoch=4, lr=0.01, optim="SGD",
        ema_m=0.999, img_size=32, compute_dtype="float32",
        start_timing=2, N_k=2, feature_dim=128, queue_batch=2, da_len=8,
        proj_size=16))
    model = NETS.get("wrn_28_2")(num_classes=C_, dtype=jnp.float32)
    alg = ALGORITHMS.get(alg_name)(
        cfg, {"ulb_dest_len": 64, "lb_dest_len": 32,
              "lb_class_dist": np.full(C_, 1 / C_)})
    model = alg.wrap_model(model)
    state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = jax.jit(make_train_step(cfg, alg, model, tx))
    return cfg, alg, state, step


def make_batch(alg, rs, B=4, C_=4):
    spec = AugmentSpec(crop_size=32, crop_pad=4, mean=(0.5,) * 3,
                       std=(0.25,) * 3)
    raw_lb = rs.randint(0, 256, (B, 32, 32, 3)).astype(np.uint8)
    raw_ulb = rs.randint(0, 256, (B, 32, 32, 3)).astype(np.uint8)
    views = augment_views(jax.random.PRNGKey(rs.randint(1 << 30)),
                          jnp.asarray(raw_lb), jnp.asarray(raw_ulb), spec,
                          [k for k in alg.BATCH_KEYS if k.startswith("x_")],
                          weak_ulb_s=getattr(alg, "WEAK_ULB_S", False))
    batch = dict(views)
    batch["y_lb"] = jnp.asarray(rs.randint(0, C_, B))
    batch["idx_lb"] = jnp.asarray(rs.choice(32, B, replace=False), jnp.int32)
    batch["idx_ulb"] = jnp.asarray(rs.choice(64, B, replace=False), jnp.int32)
    return batch


@pytest.mark.parametrize("alg_name", ALL_ALGS)
def test_one_step(alg_name, rs):
    cfg, alg, state, step = build(alg_name)
    for i in range(3):
        state, metrics = step(state, make_batch(alg, rs))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["total_loss"])), metrics
    assert np.isfinite(float(metrics["sup_loss"]))
