"""Pallas flash attention: forward and custom-VJP backward vs the einsum
reference (interpret mode on CPU; the same kernels compile on TPU)."""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semireward_tpu.ops.attention import flash_attention


def ref_attn(q, k, v, d):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d)
    return jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize("N", [128, 200, 257])
def test_forward_matches(rs, N):
    B, H, d = 2, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    out = flash_attention(q, k, v, interpret=True, force=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_attn(q, k, v, d)),
                               rtol=1e-4, atol=1e-5)


def test_gradients_match(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, interpret=True, force=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (ref_attn(q, k, v, d) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_bias_falls_back(rs):
    # a non-key-only bias (varies over the query axis) must fall back to
    # the einsum path; a key-only [B,1,1,N] bias runs in-kernel (below)
    B, N, H, d = 1, 130, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias = jnp.asarray(rs.randn(B, 1, N, N), jnp.float32)
    out = flash_attention(q, k, v, bias=bias, force=True, interpret=True)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d) + bias
    ref = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# key-only padding bias (the BERT attention-mask path) runs IN-kernel
# ---------------------------------------------------------------------------

def _key_bias(rs, B, N, n_real):
    lens = np.full((B,), n_real)
    lens[0] = max(1, n_real - 37)
    m = (np.arange(N)[None, :] < lens[:, None]).astype(np.float32)
    return jnp.asarray(np.where(m, 0.0, -1e9))[:, None, None, :], m


def ref_attn_bias(q, k, v, d, bias):
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d) + bias
    return jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(s, -1), v)


@pytest.mark.parametrize("N", [128, 200])
def test_key_bias_in_kernel_forward(rs, N):
    B, H, d = 2, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 11)
    out = flash_attention(q, k, v, bias=bias, interpret=True, force=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref_attn_bias(q, k, v, d, bias)),
                               rtol=1e-4, atol=1e-5)


def test_key_bias_in_kernel_gradients(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 23)

    g1 = jax.grad(lambda q, k, v: (flash_attention(
        q, k, v, bias=bias, interpret=True, force=True) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (ref_attn_bias(q, k, v, d, bias) ** 2).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# in-kernel counter-hash dropout (the BERT/HuBERT training path)
# ---------------------------------------------------------------------------

def _hash_ref_attn(q, k, v, d, seed, rate, bias=None):
    """Dense reference applying the EXACT mask stream the kernel generates
    (attention_keep_mask) — fwd/grad oracle for the dropout kernels."""
    from semireward_tpu.ops.attention import attention_keep_mask, keep_threshold

    B, N, H, _ = q.shape
    Np = ((N + 127) // 128) * 128
    keep = attention_keep_mask(seed, B * H, N, Np,
                               keep_threshold(rate)).reshape(B, H, N, N)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k) / math.sqrt(d)
    if bias is not None:
        s = s + bias
    p = jax.nn.softmax(s, -1)
    p = jnp.where(keep, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


def test_dropout_forward_matches_hash_oracle(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    out = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=1234,
                          interpret=True, force=True)
    ref = _hash_ref_attn(q, k, v, d, 1234, 0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # deterministic in the seed; different seeds give different masks
    out2 = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=1234,
                           interpret=True, force=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=77,
                           interpret=True, force=True)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-3


def test_dropout_backward_regenerates_same_mask(rs):
    B, N, H, d = 2, 200, 3, 48
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 17)

    g1 = jax.grad(lambda q, k, v: (flash_attention(
        q, k, v, bias=bias, dropout_rate=0.1, dropout_seed=99,
        interpret=True, force=True) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda q, k, v: (_hash_ref_attn(
        q, k, v, d, 99, 0.1, bias=bias) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_dropout_keep_rate_and_fallback_parity(rs):
    from semireward_tpu.ops.attention import attention_keep_mask, keep_threshold

    keep = attention_keep_mask(3, 6, 200, 256, keep_threshold(0.1))
    rate = float(np.asarray(keep).mean())
    assert abs(rate - 0.9) < 0.005
    # the non-pallas fallback applies the identical stream -> same numbers
    B, N, H, d = 1, 136, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    pal = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=5,
                          interpret=True, force=True)
    fb = flash_attention(q, k, v, dropout_rate=0.1, dropout_seed=5)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(fb),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_bit_identical_to_single_device(rs):
    """flash_attention_sharded (shard_map over a pure-dp mesh) must equal
    the single-device kernel BIT-for-bit, dropout mask included — the
    bh_offset plumbs each shard's global batch*head start into the hash
    counter."""
    from semireward_tpu.ops.attention import flash_attention_sharded
    from semireward_tpu.parallel import mesh as mesh_lib

    B, N, H, d = 8, 136, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 13)
    mesh = mesh_lib.build_mesh((8,), ("data",))

    def loss_sh(q, k, v):
        out = flash_attention_sharded(q, k, v, bias=bias, dropout_rate=0.1,
                                      dropout_seed=42, mesh=mesh,
                                      interpret=True, force=True)
        return (out ** 2).sum(), out

    def loss_1(q, k, v):
        out = flash_attention(q, k, v, bias=bias, dropout_rate=0.1,
                              dropout_seed=42, interpret=True, force=True)
        return (out ** 2).sum(), out

    (l_sh, o_sh), g_sh = jax.value_and_grad(loss_sh, argnums=(0, 1, 2),
                                            has_aux=True)(q, k, v)
    (l_1, o_1), g_1 = jax.value_and_grad(loss_1, argnums=(0, 1, 2),
                                         has_aux=True)(q, k, v)
    np.testing.assert_array_equal(np.asarray(o_sh), np.asarray(o_1))
    for a, b in zip(g_sh, g_1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_uneven_batch_falls_back(rs):
    """flax-init sample batches / eval remainders can't shard evenly — the
    wrapper must fall back to the GSPMD-partitionable einsum path."""
    from semireward_tpu.ops.attention import flash_attention_sharded
    from semireward_tpu.parallel import mesh as mesh_lib

    B, N, H, d = 3, 136, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    mesh = mesh_lib.build_mesh((8,), ("data",))
    out = flash_attention_sharded(q, k, v, mesh=mesh, interpret=True,
                                  force=True)
    ref = ref_attn(q, k, v, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_sharded_2d_mesh_bit_identical(rs):
    """On the 2-D data×fsdp mesh the batch shards over BOTH axes (the
    FSDP compute pattern) and the dropout counter offset linearizes the
    shard index over the axis tuple — still bit-identical to the
    single-device kernel."""
    from semireward_tpu.ops.attention import flash_attention_sharded
    from semireward_tpu.parallel import mesh as mesh_lib

    B, N, H, d = 8, 136, 2, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 13)
    mesh = mesh_lib.build_mesh((4, 2), ("data", "fsdp"))

    def loss_sh(q, k, v):
        out = flash_attention_sharded(q, k, v, bias=bias, dropout_rate=0.1,
                                      dropout_seed=42, mesh=mesh,
                                      interpret=True, force=True)
        return (out ** 2).sum(), out

    def loss_1(q, k, v):
        out = flash_attention(q, k, v, bias=bias, dropout_rate=0.1,
                              dropout_seed=42, interpret=True, force=True)
        return (out ** 2).sum(), out

    (_, o_sh), g_sh = jax.value_and_grad(loss_sh, argnums=(0, 1, 2),
                                         has_aux=True)(q, k, v)
    (_, o_1), g_1 = jax.value_and_grad(loss_1, argnums=(0, 1, 2),
                                       has_aux=True)(q, k, v)
    np.testing.assert_array_equal(np.asarray(o_sh), np.asarray(o_1))
    for a, b in zip(g_sh, g_1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_trainer_mesh_gating(tmp_path):
    """use_flash_attention wires the shard_map'd kernel (fused_mesh) and
    trains on EVERY mesh family: the 8-way pure-dp mesh, the 2-D
    data×fsdp mesh, and (round 4) the data×model TP mesh, where the
    wrapper shards the head dim over 'model' and keeps the kernel."""
    import semireward_tpu as st

    base = dict(
        algorithm="fixmatch", dataset="synthetic", net="vit_tiny_patch2_32",
        num_classes=4, num_labels=8, batch_size=8, uratio=1,
        eval_batch_size=8, img_size=8, crop_ratio=1.0, ema_m=0.0,
        num_train_iter=2, num_eval_iter=4, num_log_iter=1, epoch=1,
        save_dir=str(tmp_path))
    kwargs = dict(embed_dim=64, depth=1, num_heads=4, patch_size=4)

    cfg = st.get_config(dict(mesh_shape=(8,), **base))
    cfg.extra["use_flash_attention"] = True
    cfg.extra["net_kwargs"] = dict(kwargs)
    tr = st.Trainer(cfg)
    assert tr.model.use_flash and tr.model.fused_mesh is not None
    tr.fit()
    assert np.isfinite(tr.evaluate()["loss"])

    # 2-D data×fsdp: kernel kept (VERDICT r3 weak #4 — the pod stretch
    # layout must not lose the pallas path)
    cfg2 = st.get_config(dict(mesh_shape=(2, 4),
                              mesh_axes=("data", "fsdp"), **base))
    cfg2.extra["use_flash_attention"] = True
    cfg2.extra["net_kwargs"] = dict(kwargs)
    tr2 = st.Trainer(cfg2)
    assert tr2.model.use_flash and tr2.model.fused_mesh is not None
    tr2.fit()
    assert np.isfinite(tr2.evaluate()["loss"])

    # TP mesh: kernel kept too (round 4 — heads shard over 'model' in the
    # wrapper; the counter's (local_heads, stride) decomposition keeps the
    # dropout stream bit-identical)
    cfg3 = st.get_config(dict(mesh_shape=(2, 4),
                              mesh_axes=("data", "model"), **base))
    cfg3.extra["use_flash_attention"] = True
    cfg3.extra["net_kwargs"] = dict(kwargs, split_qkv=True)
    tr3 = st.Trainer(cfg3)
    assert tr3.model.use_flash and tr3.model.fused_mesh is not None
    tr3.fit()
    assert np.isfinite(tr3.evaluate()["loss"])


def test_flash_auto_default_rule():
    """The measurement-set default (docs/benchmark.md round 4): flash
    auto-ON on TPU for BERT at max_length>=384 and for HuBERT/wav2vec2;
    OFF for ViT, short-sequence BERT, and any non-TPU platform."""
    import semireward_tpu as st
    from semireward_tpu.core.trainer import flash_auto_default

    def cfg(net, max_length=512):
        return st.get_config(dict(net=net, max_length=max_length,
                                  num_classes=2))

    assert flash_auto_default(cfg("bert_base_uncased", 512), "tpu")
    assert flash_auto_default(cfg("bert_base_cased", 384), "tpu")
    assert not flash_auto_default(cfg("bert_base_uncased", 256), "tpu")
    assert flash_auto_default(cfg("hubert_base"), "tpu")
    assert flash_auto_default(cfg("wave2vecv2_base"), "tpu")
    assert not flash_auto_default(cfg("vit_small_patch2_32"), "tpu")
    assert not flash_auto_default(cfg("bert_base_uncased", 512), "cpu")


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_tp_sharded_bit_identical(rs):
    """Tensor-parallel mesh: heads shard over 'model' (the Megatron
    split-qkv layout) and the dropout counter decomposes each shard's
    local index via (local_heads, head_stride) — output, grads, AND the
    dropout mask stream must equal the single-device kernel bit for
    bit."""
    from semireward_tpu.ops.attention import flash_attention_sharded
    from semireward_tpu.parallel import mesh as mesh_lib

    B, N, H, d = 4, 136, 4, 32
    q = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    k = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    v = jnp.asarray(rs.randn(B, N, H, d), jnp.float32)
    bias, _ = _key_bias(rs, B, N, N - 13)

    def loss_1(q, k, v):
        out = flash_attention(q, k, v, bias=bias, dropout_rate=0.1,
                              dropout_seed=42, interpret=True, force=True)
        return (out ** 2).sum(), out

    (_, o_1), g_1 = jax.value_and_grad(loss_1, argnums=(0, 1, 2),
                                       has_aux=True)(q, k, v)

    for shape, axes in (((2, 4), ("data", "model")),
                        ((2, 2, 2), ("data", "fsdp", "model"))):
        mesh = mesh_lib.build_mesh(shape, axes)

        def loss_sh(q, k, v):
            out = flash_attention_sharded(
                q, k, v, bias=bias, dropout_rate=0.1, dropout_seed=42,
                mesh=mesh, interpret=True, force=True)
            return (out ** 2).sum(), out

        (_, o_sh), g_sh = jax.value_and_grad(loss_sh, argnums=(0, 1, 2),
                                             has_aux=True)(q, k, v)
        np.testing.assert_array_equal(np.asarray(o_sh), np.asarray(o_1))
        for a, b in zip(g_sh, g_1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
