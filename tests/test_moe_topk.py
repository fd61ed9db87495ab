"""Top-k MoE routing (GShard-style top-2 vs the Switch top-1).

Oracle: a per-token numpy loop computing the gated combination of the
selected experts' FFN outputs from the same parameters — the dense-dispatch
einsum formulation must match it exactly (same math, fixed shapes), and
``num_selected=1`` must reproduce the original Switch behavior bitwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from accvlab_tpu.models.moe import MoEClassifier, SwitchFFN


def _apply(model, x, seed=0):
    params = model.init(jax.random.PRNGKey(seed), x)
    out, aux = jax.jit(model.apply)(params, x)
    return params, np.asarray(out), float(aux)


def _oracle(params, x, k):
    """Per-token loop: softmax router, pick top-k, gate, combine."""
    p = params["params"]
    rw, rb = np.asarray(p["router"]["kernel"]), np.asarray(p["router"]["bias"])
    w_in, w_out = np.asarray(p["w_in"]), np.asarray(p["w_out"])
    b, t, d = x.shape
    out = np.zeros((b, t, d), np.float32)
    for i in range(b):
        for j in range(t):
            tok = np.asarray(x[i, j])
            logits = tok @ rw + rb
            probs = np.exp(logits - logits.max())
            probs = probs / probs.sum()
            top = np.argsort(-probs, kind="stable")[:k]
            gates = probs[top]
            if k == 1:
                g = gates  # Switch: raw top-1 probability
            else:
                g = gates / (gates.sum() + 1e-9)
            acc = np.zeros(d, np.float32)
            for gi, e_idx in zip(g, top):
                h = tok.astype(np.float32) @ w_in[e_idx]
                h = np.asarray(jax.nn.gelu(jnp.asarray(h, jnp.bfloat16)))
                y = h.astype(np.float32) @ w_out[e_idx]
                acc += gi * y
            out[i, j] = acc
    return out


@pytest.mark.parametrize("k", [1, 2, 3])
def test_topk_matches_per_token_oracle(k):
    e, d, h = 4, 6, 8
    model = SwitchFFN(num_experts=e, dim=d, hidden=h, num_selected=k)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, d), jnp.float32)
    params, out, aux = _apply(model, x)
    want = _oracle(params, np.asarray(x), k)
    # bf16 expert matmuls: the oracle runs them in f32/bf16-mixed too, but
    # contraction order differs — tolerance covers the bf16 rounding
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=2e-2)
    assert np.isfinite(aux) and aux > 0.0


def test_top1_unchanged_vs_topk_path():
    """num_selected=1 must reproduce the original Switch formulation
    bitwise (top_k(1) and argmax tie-break identically; the gate folds
    into the combine weights commutatively)."""
    e, d, h = 4, 6, 8
    model = SwitchFFN(num_experts=e, dim=d, hidden=h, num_selected=1)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 7, d), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def original_switch(params, x):
        p = params["params"]
        logits = x @ p["router"]["kernel"] + p["router"]["bias"]
        probs = jax.nn.softmax(logits, axis=-1)
        top = jnp.argmax(probs, axis=-1)
        mask = jax.nn.one_hot(top, e, dtype=x.dtype)
        gate = jnp.sum(probs * mask, axis=-1, keepdims=True)
        hdn = jnp.einsum(
            "btd,edh->beth", x.astype(jnp.bfloat16), p["w_in"].astype(jnp.bfloat16)
        )
        hdn = jax.nn.gelu(hdn)
        y = jnp.einsum("beth,ehd->betd", hdn, p["w_out"].astype(jnp.bfloat16))
        return jnp.einsum("bte,betd->btd", mask * gate, y.astype(jnp.float32))

    got, _ = jax.jit(model.apply)(params, x)
    want = jax.jit(original_switch)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_full_selection_equals_probability_mixture():
    """num_selected == num_experts: the renormalized gates are exactly the
    softmax probabilities (they already sum to 1), so the block computes
    the full probability-weighted mixture — checked against the oracle."""
    e, d, h = 4, 6, 8
    model = SwitchFFN(num_experts=e, dim=d, hidden=h, num_selected=e)
    # num_selected == num_experts: gates renormalize over ALL experts, so
    # the output is the full probability-weighted mixture
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 4, d), jnp.float32)
    params, out, _ = _apply(model, x)
    want = _oracle(params, np.asarray(x), e)
    np.testing.assert_allclose(out, want, rtol=2e-2, atol=2e-2)


def test_top2_expert_parallel_matches_single_device():
    """Top-2 routing under the expert-parallel mesh: loss matches the
    single-device step (GSPMD inserts the cross-expert combine)."""
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    from accvlab_tpu.models.moe import (
        make_moe_example_batch,
        make_moe_shardings,
        make_moe_train_step,
    )

    model = MoEClassifier(num_experts=8, dim=16, num_classes=5, num_selected=2)
    batch = make_moe_example_batch(batch_size=4, tokens=8, in_dim=12, num_classes=5)
    init_fn, train_step = make_moe_train_step(model)
    params = init_fn(jax.random.PRNGKey(0), batch["tokens"])
    _, ref_metrics = jax.jit(train_step)(params, batch)

    mesh = Mesh(mesh_utils.create_device_mesh((2, 4)), axis_names=("data", "expert"))
    params_sh, batch_sh = make_moe_shardings(mesh, params, batch)
    with mesh:
        p = jax.device_put(params, params_sh)
        b = jax.device_put(batch, batch_sh)
        _, metrics = jax.jit(train_step, in_shardings=(params_sh, batch_sh))(p, b)
        jax.block_until_ready(metrics["loss"])
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-5
    )


def test_top2_overfits():
    """Top-2 classifier learns (trainability smoke, mirrors the top-1
    convergence test)."""
    from accvlab_tpu.models.moe import make_moe_example_batch, make_moe_train_step

    model = MoEClassifier(num_experts=4, dim=32, num_classes=4, num_selected=2)
    batch = make_moe_example_batch(batch_size=8, tokens=8, in_dim=12, num_classes=4)
    init_fn, train_step = make_moe_train_step(model)
    params = init_fn(jax.random.PRNGKey(2), batch["tokens"])
    step = jax.jit(train_step, static_argnums=(2,))
    first = None
    for _ in range(250):
        params, metrics = step(params, batch, 5e-2)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < 0.3 * first, (first, float(metrics["loss"]))
