"""Host-side training driver.

What survives of the reference's hook pipeline after the per-step work moved
into one jitted function: the periodic host actions — evaluation
(EvaluationHook), checkpoint latest/best (CheckpointHook), logging
(LoggingHook/TimerHook), LR reporting — on the same cadences
(num_eval_iter / num_log_iter, core/hooks/*.py). Doubles as the "lighting"
Trainer (reference semilearn/lighting/trainer.py:173-257): fit / evaluate /
predict.

Performance notes:
- augmentation + train step compile into ONE program; the TrainState is
  donated, so params/opt/EMA update in place in HBM.
- metrics are fetched only at log boundaries — zero `.item()`-style syncs in
  the hot loop (SURVEY §3 hotspot: the reference syncs 4+ scalars/step).
- the input pipeline double-buffers: batch k+1 is device_put while step k runs.
"""
from __future__ import annotations

import math
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from semireward_tpu.config import Config
from semireward_tpu.registry import ALGORITHMS, NETS
from semireward_tpu.core import checkpoint as ckpt
from semireward_tpu.core import metrics as M
from semireward_tpu.core.optim import cosine_schedule_with_warmup
from semireward_tpu.core.step import init_train_state, make_train_step
from semireward_tpu.data.augment import AugmentSpec, augment_views, normalize
from semireward_tpu.data.datasets import get_dataset, SSLDataBundle
from semireward_tpu.data.loader import SSLLoader, eval_batches
from semireward_tpu.parallel import mesh as mesh_lib
from semireward_tpu.utils import prng
from semireward_tpu.utils.logging import get_logger


def _model_dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[cfg.compute_dtype]


def flash_auto_default(cfg: Config, platform: str) -> bool:
    """`use_flash_attention` default when the config leaves it unset —
    SET BY MEASUREMENT (docs/benchmark.md round 4, v5e): the usb_nlp
    geometry (BERT-base, N=512, bs8 u1, use_cat=False) is +15%
    end-to-end with the pallas kernel (8.33 vs 7.24 steps/s) and
    usb_audio (HuBERT-base, N=199 frames) +20% (13.40 vs 11.18) — the
    in-kernel key-padding bias + prob dropout avoid the [B,H,N,N] probs
    HBM round-trip. At ViT's N=257 XLA's fused einsum measured faster,
    so ViT stays off. TPU-only (the kernel falls back off-TPU anyway)."""
    return (platform == "tpu"
            and ((cfg.net.startswith("bert_") and cfg.max_length >= 384)
                 or cfg.net.startswith(("hubert_", "wave2vecv2_"))))


class Trainer:
    """End-to-end trainer. ``Trainer(cfg).train()`` is the CLI path;
    fit/evaluate/predict mirror the lighting API."""

    def __init__(self, cfg: Config, bundle: Optional[SSLDataBundle] = None,
                 use_mesh: bool = True, logger=None, alg_factory=None):
        from semireward_tpu.data.modality import modality_of, GenericBundle
        from semireward_tpu.parallel.mesh import setup_distributed
        self.cfg = cfg
        self.logger = logger or get_logger(cfg.save_name)
        # multi-host pod bootstrap (no-op single host); rank/world feed the
        # rank-strided samplers (reference DistributedSampler semantics)
        self.rank, self.world = setup_distributed(cfg)
        self.modality = modality_of(cfg.net)
        if bundle is not None:
            self.bundle = bundle
        elif self.modality == "nlp":
            if cfg.net.startswith("dnabert"):
                # bio/DNA: CSV + k-mer data rides the NLP pipeline with its
                # own collator (the reference builds this dataset,
                # bio_datasets/csv_data.py:73-148, but never dispatches it)
                from semireward_tpu.data.bio import (get_bio_dataset,
                                                     BioCollator)
                splits = get_bio_dataset(cfg, cfg.algorithm)
                self.bundle = GenericBundle(splits, cfg.num_classes)
                self.collator = BioCollator(k=int(cfg.extra.get("kmer", 6)),
                                            max_length=cfg.max_length)
            else:
                from semireward_tpu.data.nlp import (get_nlp_dataset,
                                                     get_tokenizer,
                                                     NLPCollator,
                                                     auto_buckets)
                splits = get_nlp_dataset(cfg, cfg.algorithm)
                self.bundle = GenericBundle(splits, cfg.num_classes)
                # static length buckets (default 64/128/256/max_length):
                # batches pad to the smallest bucket that fits — the
                # reference's dynamic-padding FLOP economics
                # (nlp_collactor.py:49-126) under jit's static shapes.
                # extra['length_buckets'] = list to override, or
                # False/[] to pin the single max_length bucket.
                bk = cfg.extra.get("length_buckets", "auto")
                bk = auto_buckets(cfg.max_length) if bk == "auto" \
                    else (bk or None)
                self.collator = NLPCollator(get_tokenizer(cfg.net),
                                            max_length=cfg.max_length,
                                            buckets=bk)
        elif self.modality == "audio":
            from semireward_tpu.data.audio import (get_audio_dataset,
                                                   AudioCollator)
            splits = get_audio_dataset(cfg, cfg.algorithm)
            self.bundle = GenericBundle(splits, cfg.num_classes)
            self.collator = AudioCollator(cfg.max_length_seconds,
                                          cfg.sample_rate)
        else:
            self.bundle = get_dataset(cfg, cfg.algorithm)
        data_info = {"ulb_dest_len": self.bundle.ulb_dest_len,
                     "lb_dest_len": self.bundle.lb_dest_len}
        if not cfg.is_regression:
            counts = np.bincount(
                np.asarray(self.bundle.train_lb.targets, np.int64),
                minlength=cfg.num_classes).astype(np.float64)
            data_info["lb_class_dist"] = counts / max(counts.sum(), 1)

        self.mesh = mesh_lib.build_mesh(cfg.mesh_shape, cfg.mesh_axes) \
            if use_mesh else None
        builder = NETS.get(cfg.net)
        net_kw = {}
        if "bn_momentum" in cfg.extra:
            net_kw["bn_momentum"] = float(cfg.extra["bn_momentum"])
        if cfg.gradient_checkpointing:
            net_kw["remat"] = True
        flash_cfg = cfg.extra.get("use_flash_attention")
        if flash_cfg is None:
            flash_cfg = flash_auto_default(
                cfg, jax.devices()[0].platform)
        if flash_cfg:
            # every mesh family keeps the pallas kernel via the shard_map'd
            # wrapper (ops/attention.py:flash_attention_sharded): data-like
            # meshes shard the batch, 'model' (TP) meshes additionally
            # shard the HEAD dim (attention is head-separable; the dropout
            # counter decomposes each shard's local index so the mask
            # stream stays bit-identical to single-device)
            net_kw["use_flash"] = True
        fused = cfg.extra.get("use_fused_mlp")
        if fused is None and cfg.net.startswith(
                ("vit_", "dinov2_", "bert_", "hubert_", "wave2vecv2_")):
            # auto-default: the pallas MLP (ops/fused_mlp.py) keeps the 4C
            # hidden in VMEM — +17% measured on the headline ViT-S step
            # (85.4 vs 73.0 steps/s/chip, v5e — NOTES_DEV round 3); the
            # H=3072 families (ViT-B/BERT/HuBERT/wav2vec2) take its
            # hidden-blocked variant. Engages on a single TPU chip or ANY
            # mesh: data-like meshes (pure-dp or data×fsdp) run the
            # shard_map'd per-shard kernel
            # (ops/fused_mlp.py:fused_mlp_sharded); 'model' (TP) meshes
            # run the Megatron hidden-sharded form (fused_mlp_tp_sharded:
            # per-shard partial + psum over 'model'). Force via
            # extra['use_fused_mlp'] to override either way.
            from semireward_tpu.ops.fused_mlp import fused_mlp_available
            fused = fused_mlp_available()
        if fused:
            net_kw["use_fused_mlp"] = True
        if self.mesh is not None and jax.device_count() > 1 \
                and (fused or net_kw.get("use_flash")):
            # the mesh the pallas wrappers shard_map over — every mesh
            # family keeps the kernels (data-like meshes shard the batch;
            # 'model' TP meshes run the head-sharded flash / Megatron
            # hidden-sharded fused-MLP forms)
            net_kw["fused_mesh"] = self.mesh
        if "auto_split_forward" not in cfg.extra:
            # auto-default SET BY MEASUREMENT (round 4, v5e): running the
            # stop-graded weak view forward-ONLY on stat-free nets is +21%
            # on the headline ViT-S SR step (103.3 vs 85.1 steps/s/chip).
            # The gate conditions (use_cat, stop_grad_w, no batch_stats)
            # live in algorithms/base.py:forward; loss-equivalent, dropout
            # RNG-stream deviation documented (DEVIATIONS.md #32). CPU runs
            # keep the exact concat path (bit-parity tests).
            cfg.extra["auto_split_forward"] = (
                jax.devices()[0].platform == "tpu")
        # explicit geometry overrides for the builder (tests/small runs)
        net_kw.update(cfg.extra.get("net_kwargs", {}))
        self.model = builder(num_classes=cfg.num_classes,
                             dtype=_model_dtype(cfg), img_size=cfg.img_size,
                             **net_kw)
        self.net_builder = builder  # carries layer-decay grouping metadata
        data_info["num_features"] = getattr(self.model, "num_features",
                                            cfg.feature_dim)

        alg_cls = ALGORITHMS.get(cfg.algorithm)
        if alg_factory is not None:
            self.alg = alg_factory(cfg, data_info)
        elif cfg.imb_algorithm:
            # composition with the base algorithm (reference
            # imb_algorithms/__init__.py:14-19 dynamic inheritance)
            from semireward_tpu import imb as imb_lib
            self.alg = imb_lib.get_imb_algorithm(cfg.imb_algorithm)(
                cfg, data_info, base_cls=alg_cls)
        else:
            self.alg = alg_cls(cfg, data_info)
        self.model = self.alg.wrap_model(self.model)

        # the reference uses the no-color RandAugment for tissuemnist
        # (medmnist.py:891); configurable via extra['randaug_no_color']
        no_color = bool(cfg.extra.get(
            "randaug_no_color", cfg.dataset in ("tissuemnist", "medmnist")))
        # full-size JPEG sets decode at img_size/crop_ratio (datasets.py) —
        # views then mirror the reference's RandomCrop / RandomResizedCrop
        # from the larger decode (imagenet.py:50-66) instead of pad-crop
        src = int(getattr(self.bundle.train_lb, "img_size", cfg.img_size))
        self.aug_spec = AugmentSpec(
            crop_size=cfg.img_size,
            crop_pad=int(cfg.img_size * (1 - cfg.crop_ratio)),
            mean=self.bundle.mean, std=self.bundle.std,
            randaug_n=3, exclude_color=no_color,
            src_size=src if src > cfg.img_size else 0,
        )

        rng = prng.root_key(cfg.seed)
        if self.modality == "nlp":
            sample = {"input_ids": jnp.zeros((2, cfg.max_length), jnp.int32),
                      "attention_mask": jnp.ones((2, cfg.max_length), jnp.int32)}
        elif self.modality == "audio":
            sample = jnp.zeros(
                (2, int(cfg.max_length_seconds * cfg.sample_rate)), jnp.float32)
        else:
            sample = jnp.zeros((2, cfg.img_size, cfg.img_size, 3), jnp.float32)
        self.state, self.tx = init_train_state(cfg, self.alg, self.model, rng,
                                               sample, builder=builder)
        if cfg.use_pretrain:
            # reference train.py net_builder(pretrained=..,
            # pretrained_path=..): graft the released torch checkpoint
            # onto the freshly-initialized backbone; the EMA shadow
            # restarts from the grafted weights (reference EMA
            # registers after load, core/utils/misc.py:132-165).
            # Optimizer moments are zero-initialized either way.
            from semireward_tpu.models.utils import load_pretrained
            grafted = load_pretrained(cfg.net, self.state.params,
                                      cfg.pretrain_path)
            grafted = jax.tree_util.tree_map(  # keep the init dtypes so the
                lambda g, p: jnp.asarray(g, p.dtype),  # jitted step/opt_state
                grafted, self.state.params)            # signatures are stable
            self.state = self.state.replace(
                params=grafted,
                ema_params=jax.tree_util.tree_map(jnp.copy, grafted))
            self.logger.info(
                f"pretrained backbone loaded from {cfg.pretrain_path}")
        self._raw_step = make_train_step(cfg, self.alg, self.model, self.tx)
        self._schedule = cosine_schedule_with_warmup(
            cfg.lr, cfg.num_train_iter, cfg.num_warmup_iter)

        spec = self.aug_spec
        batch_keys = self.alg.BATCH_KEYS

        modality = self.modality

        def full_step(state, raw):
            arng = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 7919)
            if modality == "nlp":
                # views tokenized host-side; pass through
                views = {k: v for k, v in raw.items() if k.startswith("x_")}
            elif modality == "audio":
                from semireward_tpu.data.audio import strong_augment_wave
                views = {}
                for k, v in raw.items():
                    if k.endswith("_base"):
                        # zlib.crc32, not hash(): Python's hash is salted per
                        # process (PYTHONHASHSEED), which would break run
                        # reproducibility and trace different constants on
                        # each host of a pod (SPMD same-program requirement)
                        import zlib
                        views[k[:-5]] = strong_augment_wave(
                            jax.random.fold_in(
                                arng, zlib.crc32(k.encode()) % (1 << 30)), v,
                            exact_reverb=bool(
                                cfg.extra.get("audio_exact_reverb", True)))
                    elif k.startswith("x_"):
                        views[k] = v
            else:
                views = augment_views(
                    arng, raw["x_lb"], raw["x_ulb"], spec,
                    [k for k in batch_keys if k.startswith("x_")],
                    weak_ulb_s=getattr(self.alg, "WEAK_ULB_S", False))
            batch = dict(views)
            for k in ("y_lb", "idx_lb", "idx_ulb", "y_tfe_lb"):
                if k in raw:
                    batch[k] = raw[k]
            # CoSSL TFE streams, augmented per cossl_tfe_augment
            if "x_tfe_lb" in raw:
                from semireward_tpu.data.augment import randaugment as _ra, weak_augment as _wa
                tfe_aug = _ra if self.cfg.extra.get(
                    "cossl_tfe_augment", "strong") == "strong" else _wa
                k1 = jax.random.fold_in(arng, 101)
                k2 = jax.random.fold_in(arng, 102)
                batch["x_tfe_lb"] = tfe_aug(k1, raw["x_tfe_lb"], spec)
                batch["x_tfe_ulb"] = tfe_aug(k2, raw["x_tfe_ulb"], spec)
            return self._raw_step(state, batch)

        donate = (0,) if cfg.donate_state else ()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            datash = NamedSharding(self.mesh, P("data"))
            if "model" in self.mesh.axis_names:
                # tensor-parallel (+ optional fsdp) stretch layout:
                # Megatron-style column/row kernel sharding over 'model',
                # opposite kernel dim over 'fsdp' when present
                # (parallel/mesh.py:tp_state_sharding)
                extra = ("fsdp" if "fsdp" in self.mesh.axis_names else None)
                state_sh = mesh_lib.tp_state_sharding(self.mesh, self.state,
                                                      extra_axis=extra)
            elif "fsdp" in self.mesh.axis_names:
                # 2-D (data, fsdp) stretch layout: params/EMA/opt moments
                # shard over the fsdp axis (parallel/mesh.py)
                state_sh = mesh_lib.fsdp_state_sharding(self.mesh, self.state)
            else:
                state_sh = rep
            self.state = jax.device_put(self.state, state_sh)
            self._jit_step = jax.jit(
                full_step, donate_argnums=donate,
                in_shardings=(state_sh, datash),
                out_shardings=(state_sh, rep))
            self._batch_sharding = datash
        else:
            self._jit_step = jax.jit(full_step, donate_argnums=donate)
            self._batch_sharding = None

        def eval_fwd(state, x, out_key="logits", use_ema=True):
            params = state.ema_params if use_ema else state.params
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if modality == "cv":
                x = normalize(x, spec.mean, spec.std)
            out = self.model.apply(variables, x, train=False)
            if isinstance(out, dict):
                return out.get(out_key, out["logits"])
            return out

        self._jit_eval = jax.jit(eval_fwd,
                                 static_argnames=("out_key", "use_ema"))
        # evaluation uses the EMA shadow like the reference
        # (algorithmbase.py:382); eval.py --use_train_model flips this
        self.eval_use_ema = True

        self.best_metric = -math.inf
        self.best_it = 0
        self._save_dir = os.path.join(cfg.save_dir, cfg.save_name)
        self._iters_per_epoch = (cfg.num_train_iter // cfg.epoch
                                 if cfg.epoch > 0 else 0)
        from semireward_tpu.utils.metrics_sink import MetricsSink
        self.sink = MetricsSink(self._save_dir,
                                use_tensorboard=cfg.use_tensorboard,
                                use_wandb=cfg.use_wandb,
                                use_aim=cfg.use_aim, run_name=cfg.save_name,
                                config={k: v for k, v in cfg.to_dict().items()
                                        if isinstance(v, (int, float, str,
                                                          bool))})

    # ------------------------------------------------------------------
    def _make_loader(self, seed=None):
        cfg = self.cfg
        seed = cfg.seed if seed is None else seed
        if self.modality == "nlp":
            from semireward_tpu.data.modality import NLPSSLLoader
            return NLPSSLLoader(
                {"train_lb": self.bundle.train_lb,
                 "train_ulb": self.bundle.train_ulb},
                self.collator, cfg.batch_size // self.world,
                cfg.ulb_batch_size // self.world,
                self.alg.BATCH_KEYS, seed=seed,
                rank=self.rank, world=self.world)
        if self.modality == "audio":
            from semireward_tpu.data.modality import AudioSSLLoader
            return AudioSSLLoader(
                {"train_lb": self.bundle.train_lb,
                 "train_ulb": self.bundle.train_ulb},
                self.collator, cfg.batch_size // self.world,
                cfg.ulb_batch_size // self.world,
                self.alg.BATCH_KEYS, seed=seed,
                rank=self.rank, world=self.world)
        tfe = bool(getattr(self.alg, "EXTRA_STREAMS", ()))
        # multi-host: each host draws its rank-strided 1/world share of the
        # global batch; _put_batch reassembles the global array
        bs = cfg.batch_size // self.world
        ubs = cfg.ulb_batch_size // self.world
        return SSLLoader(
            self.bundle, bs, ubs, seed=seed,
            rank=self.rank, world=self.world,
            tfe_streams=tfe,
            tfe_ulb_batch_size=int(cfg.extra.get("cossl_tfe_u_ratio", 1))
            * bs if tfe else 0,
            sampler=cfg.train_sampler)

    def _eval_batches(self, ds):
        """Fixed-shape eval batches per modality."""
        cfg = self.cfg
        if self.modality == "cv":
            for b in eval_batches(ds, cfg.eval_batch_size):
                S = b["x"].shape[1]
                if S > cfg.img_size:
                    # full-size JPEG eval decodes at img/crop_ratio —
                    # CenterCrop to img_size (reference imagenet.py:67-70)
                    off = (S - cfg.img_size) // 2
                    b["x"] = b["x"][:, off:off + cfg.img_size,
                                    off:off + cfg.img_size]
                yield b
            return
        n = len(ds)
        bs = cfg.eval_batch_size
        for start in range(0, n, bs):
            stop = min(start + bs, n)
            idx = np.arange(start, stop)
            pad = bs - len(idx)
            mask = np.ones(bs, bool)
            if pad:
                idx = np.concatenate([idx, np.full(pad, stop - 1)])
                mask[bs - pad:] = False
            y = np.asarray(ds.targets)[idx]
            if self.modality == "nlp":
                x = self.collator([ds.texts[i] for i in idx])
            else:
                x = self.collator([ds.waves[i] for i in idx])
            yield {"x": x, "y": y, "mask": mask}

    def _put_batch(self, raw: Dict[str, np.ndarray]):
        if self._batch_sharding is not None:
            if self.world > 1:
                from semireward_tpu.parallel.mesh import put_global_batch
                return put_global_batch(self._batch_sharding, raw)
            return {k: jax.device_put(v, self._batch_sharding)
                    for k, v in raw.items()}
        return raw

    def warmup(self):
        """Dash's supervised pre-stage (reference dash/dash.py:60-155):
        num_wu_iter labeled-only steps on the same model/optimizer, then
        rho_init = eval CE loss, iteration counter reset to 0."""
        cfg = self.cfg
        import optax as _optax
        from semireward_tpu.core.losses import ce_loss as _ce
        from semireward_tpu.core.train_state import tree_ema as _tree_ema

        spec = self.aug_spec
        modality = self.modality

        def wu_step(state, raw):
            arng = jax.random.fold_in(state.rng, state.step)
            if modality == "cv":
                x = augment_views(arng, raw["x_lb"], raw["x_ulb"], spec,
                                  ["x_lb"])["x_lb"]
            else:
                # NLP/audio labeled views arrive collated host-side
                # (reference dash warmup feeds data_lb['x_lb'] unchanged,
                # dash.py:106-117)
                x = raw["x_lb"]

            def loss_fn(params):
                v = {"params": params}
                if state.batch_stats:
                    v["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"] if state.batch_stats else False
                out = self.model.apply(v, x, train=True, mutable=mutable,
                                       rngs={"dropout": arng})
                out, st = out if mutable else (out, {})
                return _ce(out["logits"], raw["y_lb"], "mean"), st

            (loss, st), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state,
                                              state.params)
            new_params = _optax.apply_updates(state.params, updates)
            return state.replace(
                step=state.step + 1, params=new_params,
                ema_params=_tree_ema(state.ema_params, new_params, cfg.ema_m),
                opt_state=new_opt,
                batch_stats=st.get("batch_stats", state.batch_stats)
                if st else state.batch_stats), loss

        jit_wu = jax.jit(wu_step, donate_argnums=0)
        # the modality-aware loader (multi-host rank striding included);
        # +99 decorrelates warmup batches from the main stream
        loader = self._make_loader(seed=cfg.seed + 99)
        n = int(cfg.extra.get("num_wu_iter", cfg.num_wu_iter))
        for i in range(n):
            self.state, loss = jit_wu(self.state, self._put_batch(next(loader)))
            if (i + 1) % cfg.num_wu_eval_iter == 0:
                self.logger.info(f"warmup {i + 1}/{n} sup_loss={float(loss):.4f}")
        eval_m = self.evaluate()
        rho_init = eval_m["loss"]
        algo_state = self.state.algo
        if hasattr(self.alg, "set_rho_init"):
            algo_state = self.alg.set_rho_init(algo_state, rho_init)
        elif hasattr(self.alg, "base") and hasattr(self.alg.base, "set_rho_init"):
            base_state, imb_state = algo_state
            algo_state = (self.alg.base.set_rho_init(base_state, rho_init),
                          imb_state)
        self.state = self.state.replace(
            algo=algo_state, step=jnp.asarray(0, jnp.int32))
        self.logger.info(f"warmup finished; rho_init={rho_init:.4f}")

    def train(self, num_iters: Optional[int] = None,
              eval_hook: Optional[Callable] = None) -> Dict[str, float]:
        cfg = self.cfg
        num_iters = num_iters or cfg.num_train_iter
        needs_wu = (getattr(self.alg, "NEEDS_WARMUP", False)
                    or getattr(getattr(self.alg, "base", None),
                               "NEEDS_WARMUP", False))
        if needs_wu and int(self.state.step) == 0:
            self.warmup()
        # Dash warmup advances the optimizer's schedule count by num_wu_iter
        # and resets only the iteration counter — FAITHFUL to the reference
        # (dash.py:152-154 resets self.it but never the torch scheduler), so
        # the applied LR runs offset; the LOGGED lr must reflect the same
        # offset or log and device disagree for the whole run (set on resume
        # too: the checkpointed opt_state carries the warmup steps)
        self._lr_log_offset = (int(cfg.extra.get("num_wu_iter",
                                                 cfg.num_wu_iter))
                               if needs_wu else 0)
        loader = self._make_loader()
        # background prefetch (depth 2 by default; extra['prefetch_depth']
        # overrides, 0 disables): a producer thread assembles batches —
        # JPEG decode on the folder datasets, gather/collate elsewhere —
        # while the device steps. Order is FIFO through one producer, so
        # the batch stream (and reproducibility) is unchanged.
        depth = int(cfg.extra.get("prefetch_depth", 2))
        if depth > 0:
            from semireward_tpu.data.loader import PrefetchLoader
            loader = PrefetchLoader(loader, depth=depth)
        log = self.logger.info
        results: Dict[str, float] = {}
        metrics_acc = None
        t0 = time.time()
        prefetch_acc = 0.0  # reference TimerHook's train/prefetch_time
        try:
            prefetched = self._put_batch(next(loader))
            start_it = int(self.state.step)
            # timing window = steps since the last t0 reset (log OR eval
            # boundary); dividing by num_log_iter when the windows interleave
            # (num_eval_iter not a multiple of num_log_iter) misreports steps/s
            window_start = start_it
            for it in range(start_it, num_iters):
                raw = prefetched
                self.state, metrics = self._jit_step(self.state, raw)
                tp = time.time()
                prefetched = self._put_batch(next(loader))  # overlap with step
                prefetch_acc += time.time() - tp
                metrics_acc = metrics  # async device values; fetched on log only

                step_now = it + 1
                if step_now % cfg.num_log_iter == 0:
                    fetched = {}
                    for k, v in metrics_acc.items():
                        if jnp.ndim(v) == 0:
                            fv = float(v)
                            # drop only ±inf (legit sentinels, e.g. SR's
                            # max_reward=-inf before stage 2) — a NaN must stay
                            # VISIBLE or divergence hides until the next eval
                            if math.isfinite(fv) or math.isnan(fv):
                                fetched[k] = fv
                    dt = time.time() - t0
                    steps_in_window = step_now - window_start
                    sps = steps_in_window / dt if steps_in_window else 0.0
                    lr = float(self._schedule(
                        step_now + getattr(self, "_lr_log_offset", 0)))
                    log(f"it {step_now}/{num_iters} "
                        + " ".join(f"{k}={v:.4f}" for k, v in sorted(fetched.items()))
                        + f" lr={lr:.2e} steps/s={sps:.2f}")
                    n = max(steps_in_window, 1)
                    self.sink.log({**{f"train/{k}": v for k, v in fetched.items()},
                                   "lr": lr, "train/steps_per_sec": sps,
                                   "train/prefetch_time": prefetch_acc / n,
                                   "train/run_time": max(dt / n - prefetch_acc / n,
                                                         0.0)},
                                  step_now)
                    prefetch_acc = 0.0
                    t0 = time.time()
                    window_start = step_now

                # host-side epoch actions (SAW/ADSH re-weighting etc.,
                # reference after_train_epoch hooks)
                if (self._iters_per_epoch and step_now % self._iters_per_epoch == 0
                        and hasattr(self.alg, "on_epoch_end")):
                    new_state = self.alg.on_epoch_end(self, self.state)
                    if new_state is not None:
                        self.state = new_state

                if step_now % cfg.num_eval_iter == 0 or step_now == num_iters:
                    eval_m = self.evaluate()
                    key = "top-1-acc" if not cfg.is_regression else "mse"
                    score = eval_m[key] if not cfg.is_regression else -eval_m[key]
                    # all ranks call save (sharded leaves gather collectively,
                    # checkpoint.py:_to_numpy); rank 0 alone writes the file
                    if score > self.best_metric:
                        self.best_metric = score
                        self.best_it = step_now
                        ckpt.save_checkpoint(
                            os.path.join(self._save_dir, "model_best.ckpt"),
                            self.state, self._ckpt_extra(step_now, eval_m),
                            write=self.rank == 0)
                    ckpt.save_checkpoint(
                        os.path.join(self._save_dir, "latest_model.ckpt"),
                        self.state, self._ckpt_extra(step_now, eval_m),
                        write=self.rank == 0)
                    log(f"eval @ {step_now}: "
                        + " ".join(f"{k}={v:.4f}" for k, v in eval_m.items())
                        + f" (best {self.best_metric:.4f} @ {self.best_it})")
                    self.sink.log({f"eval/{k}": v for k, v in eval_m.items()},
                                  step_now)
                    results = {f"eval/{k}": v for k, v in eval_m.items()}
                    results["eval/best_acc"] = self.best_metric
                    results["eval/best_it"] = self.best_it
                    if eval_hook:
                        eval_hook(step_now, eval_m)
                    t0 = time.time()
                    window_start = step_now
                    prefetch_acc = 0.0

        finally:
            if hasattr(loader, "close"):
                loader.close()  # stop the prefetch producer even on error

        # after_run protocol (reference hooks/evaluation.py:31-54): reload
        # the best checkpoint and evaluate the test split when one exists
        test_ds = getattr(self.bundle, "test", None)
        best_path = os.path.join(self._save_dir, "model_best.ckpt")
        have_best = os.path.exists(best_path)
        if self.world > 1 and test_ds is not None:
            # the decision must be UNIFORM across ranks: the ckpt is written
            # on rank 0's disk only, so an os.path.exists gate would send
            # rank 0 into a collective eval the other ranks skip (deadlock).
            # Without a shared filesystem the reload is skipped everywhere.
            from jax.experimental import multihost_utils
            haves = multihost_utils.process_allgather(
                jnp.asarray(have_best, jnp.int32))
            all_have = bool(np.min(np.asarray(haves)) > 0)
            if have_best and not all_have:
                log("best-ckpt test eval skipped: multi-host run without a "
                    "shared filesystem (model_best.ckpt on rank 0 only)")
            have_best = all_have
        if test_ds is not None and have_best:
            cur = self.state
            try:
                self.state, _ = ckpt.load_checkpoint(best_path, self.state)
                test_m = self.evaluate(split="test")
                results.update({f"test/{k}": v for k, v in test_m.items()})
                log("test (best ckpt): "
                    + " ".join(f"{k}={v:.4f}" for k, v in test_m.items()))
            finally:
                self.state = cur
        return results

    # lighting-compatible alias (reference lighting/trainer.py:188)
    def fit(self, *a, **kw):
        return self.train(*a, **kw)

    def evaluate(self, split: str = "eval") -> Dict[str, float]:
        ds = (getattr(self.bundle, "test", None)
              if split == "test" else self.bundle.eval)
        if ds is None:
            ds = self.bundle.eval
        if hasattr(self.alg, "eval_out_key"):
            out_key = self.alg.eval_out_key(int(self.state.step))
        else:
            out_key = getattr(self.alg, "EVAL_OUT_KEY", "logits")
        preds, trues, logits_all = [], [], []
        for b in self._eval_batches(ds):
            logits = np.asarray(self._jit_eval(self.state, b["x"],
                                               out_key=out_key,
                                               use_ema=self.eval_use_ema))
            logits = logits[b["mask"]]
            y = b["y"][b["mask"]]
            preds.append(logits.argmax(-1))
            trues.append(y)
            logits_all.append(logits)
        y_pred = np.concatenate(preds)
        y_true = np.concatenate(trues)
        y_logits = np.concatenate(logits_all)
        if self.cfg.is_regression:
            return M.regression_metrics(y_true, y_logits[:, 0])
        out = M.classification_metrics(y_true, y_pred, self.cfg.num_classes,
                                       y_logits)
        # eval CE loss like the reference (algorithmbase.py:406-409)
        lp = y_logits - y_logits.max(-1, keepdims=True)
        lse = np.log(np.exp(lp).sum(-1))
        out["loss"] = float((lse - lp[np.arange(len(y_true)), y_true]).mean())
        return out

    def predict(self, x: np.ndarray, batch_size: Optional[int] = None
                ) -> np.ndarray:
        bs = batch_size or self.cfg.eval_batch_size
        outs = []
        for s in range(0, len(x), bs):
            xb = x[s:s + bs]
            pad = bs - len(xb)
            if pad:
                xb = np.concatenate([xb, np.repeat(xb[-1:], pad, 0)])
            logits = np.asarray(self._jit_eval(self.state, xb,
                                               use_ema=self.eval_use_ema))
            outs.append(logits[: bs - pad if pad else bs])
        return np.concatenate(outs)

    # ------------------------------------------------------------------
    def _ckpt_extra(self, step_now: int, eval_m: Dict[str, float]) -> Dict:
        """Checkpoint metadata: the reference persists best_it/best_eval_acc
        in the save dict so a resume keeps the best-model tracking
        (core/algorithmbase.py get_save_dict/load_model)."""
        return {"it": step_now, "eval": eval_m,
                "best_metric": self.best_metric, "best_it": self.best_it,
                "algorithm": self.cfg.algorithm}

    def load(self, path: str):
        self.state, extra = ckpt.load_checkpoint(path, self.state)
        # restore best tracking so post-resume evals don't clobber
        # model_best.ckpt with a worse model
        if "best_metric" in extra:
            self.best_metric = float(extra["best_metric"])
            self.best_it = int(extra.get("best_it", 0))
        self.logger.info(f"resumed from {path} at it={extra.get('it')}")
        return extra

    def load_weights(self, path: str):
        """Algorithm-agnostic weight load for offline eval: grafts only
        params/ema_params/batch_stats (see checkpoint.load_eval_weights)."""
        self.state, extra = ckpt.load_eval_weights(path, self.state)
        return extra

    def save(self, path: str):
        ckpt.save_checkpoint(
            path, self.state,
            {"it": int(self.state.step), "best_metric": self.best_metric,
             "best_it": self.best_it, "algorithm": self.cfg.algorithm})
