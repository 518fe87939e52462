"""Rewarder/Generator forward parity against a torch recomputation of the
reference formulas (semireward.py:6-72), weight-for-weight."""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from semireward_tpu.algorithms.semireward import Rewarder, Generator


def torch_rewarder_forward(p, features, labels):
    """Exact reference math (semireward.py:52-72) with our flax weights."""
    t = lambda k: torch.tensor(np.asarray(p[k]))
    feats = torch.tensor(features)
    f = feats @ t(("feature_fc", "kernel")) + t(("feature_fc", "bias"))
    f = F.layer_norm(f, (128,), t(("feature_norm", "scale")),
                     t(("feature_norm", "bias")), eps=1e-5)
    emb_table = t(("label_embedding", "embedding"))
    emb = emb_table[torch.tensor(labels)]
    emb = F.layer_norm(emb, (128,), t(("label_norm", "scale")),
                       t(("label_norm", "bias")), eps=1e-5)
    cat = torch.cat([f, emb], dim=0)
    w = torch.softmax(cat @ t(("cross_attention_fc", "kernel"))
                      + t(("cross_attention_fc", "bias")), dim=0)
    ctx = (w * cat).sum(dim=0)
    h = ctx.unsqueeze(0).expand(emb.size(0), -1) + emb
    h = F.relu(h @ t(("mlp_fc1", "kernel")) + t(("mlp_fc1", "bias")))
    h = h @ t(("mlp_fc2", "kernel")) + t(("mlp_fc2", "bias"))
    h = F.relu(h @ t(("ffn_fc1", "kernel")) + t(("ffn_fc1", "bias")))
    return torch.sigmoid(h @ t(("ffn_fc2", "kernel")) + t(("ffn_fc2", "bias")))


def flatten_params(params, prefix=()):
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            out.update(flatten_params(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


class TestRewarderParity:
    def test_forward_matches_reference_math(self, rs):
        r = Rewarder(label_dim=100, label_embedding_dim=128, feature_dim=48)
        feats = rs.randn(6, 48).astype(np.float32)
        labels = rs.randint(0, 100, 6)
        variables = r.init(jax.random.PRNGKey(3), jnp.asarray(feats),
                           jnp.asarray(labels))
        ours = np.asarray(r.apply(variables, jnp.asarray(feats),
                                  jnp.asarray(labels)))
        p = flatten_params(variables["params"])
        ref = torch_rewarder_forward(p, feats, labels).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestGeneratorParity:
    def test_forward_matches_reference_math(self, rs):
        g = Generator(feature_dim=32)
        x = rs.randn(5, 32).astype(np.float32)
        variables = g.init(jax.random.PRNGKey(1), jnp.asarray(x))
        ours = np.asarray(g.apply(variables, jnp.asarray(x)))
        p = flatten_params(variables["params"])
        h = torch.tensor(x)
        for i, relu_after in ((0, True), (1, True), (2, True), (3, True)):
            h = h @ torch.tensor(np.asarray(p[(f"fc{i}", "kernel")])) \
                + torch.tensor(np.asarray(p[(f"fc{i}", "bias")]))
            if relu_after:  # reference applies ReLU after every layer incl last
                h = F.relu(h)
        np.testing.assert_allclose(ours, h.numpy(), rtol=1e-4, atol=1e-5)
