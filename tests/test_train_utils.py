"""make_grad_accum_step: accumulation == the full-batch step.

For a mean-reduced loss, the mean of per-microbatch gradients over equal
microbatches IS the full-batch gradient — so accumulation must reproduce
the plain step's trajectory (allclose at f32), at any accum_steps that
divides the batch, under jit, and sharded over the data axis.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from accvlab_tpu.models import make_grad_accum_step


def _loss_fn(params, batch):
    pred = batch["x"] @ params["w"] + params["b"]
    return jnp.mean((pred - batch["y"]) ** 2)


def _data(n=16, d=5, k=3, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)),
        "y": jnp.asarray(rng.normal(size=(n, k)).astype(np.float32)),
    }


def _params(d=5, k=3):
    return {"w": jnp.ones((d, k)) * 0.1, "b": jnp.zeros((k,))}


@pytest.mark.parametrize("accum", [1, 2, 4, 8])
def test_accumulation_matches_full_batch_step(accum):
    opt = optax.adam(1e-2)
    batch = _data()
    params = _params()
    opt_state = opt.init(params)

    def full_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(_loss_fn)(params, batch)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    accum_step = jax.jit(make_grad_accum_step(_loss_fn, opt, accum))
    full_step = jax.jit(full_step)

    p_a, o_a, p_f, o_f = params, opt_state, params, opt_state
    for _ in range(5):
        p_a, o_a, l_a = accum_step(p_a, o_a, batch)
        p_f, o_f, l_f = full_step(p_f, o_f, batch)
        np.testing.assert_allclose(float(l_a), float(l_f), rtol=1e-6)
    for a, f in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(f), rtol=1e-5, atol=1e-7)


def test_remat_variant_matches():
    opt = optax.sgd(0.1)
    batch = _data()
    params = _params()
    s_plain = jax.jit(make_grad_accum_step(_loss_fn, opt, 4))
    s_remat = jax.jit(make_grad_accum_step(_loss_fn, opt, 4, remat=True))
    p1, _, l1 = s_plain(params, opt.init(params), batch)
    p2, _, l2 = s_remat(params, opt.init(params), batch)
    assert float(l1) == float(l2)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_indivisible_batch_fails_loudly():
    opt = optax.sgd(0.1)
    step = make_grad_accum_step(_loss_fn, opt, 3)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(step)(_params(), opt.init(_params()), _data(n=16))
    with pytest.raises(ValueError):
        make_grad_accum_step(_loss_fn, opt, 0)


def test_sharded_over_data_axis():
    """The accumulation step composes with data-axis sharding: same result
    as unsharded, batch leaves distributed over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from accvlab_tpu.parallel import make_mesh

    opt = optax.adam(1e-2)
    batch = _data()
    params = _params()
    step = jax.jit(make_grad_accum_step(_loss_fn, opt, 2))
    p_ref, _, l_ref = step(params, opt.init(params), batch)

    mesh = make_mesh()
    bsh = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1))))
        ),
        batch,
    )
    with mesh:
        p_sh, _, l_sh = step(params, opt.init(params), bsh)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p_sh), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_composes_with_shared_jit():
    """A restarted trainer's accumulation step shares the compiled
    executable (the program-cache contract extends here)."""
    from accvlab_tpu.tools import program_cache_stats, shared_jit

    opt = optax.adam(1e-2)
    batch = _data()
    params = _params()
    ex = (params, opt.init(params), batch)
    before = program_cache_stats()
    s1 = shared_jit(make_grad_accum_step(_loss_fn, opt, 4), ex)
    s2 = shared_jit(make_grad_accum_step(_loss_fn, opt, 4), ex)
    d = {k: program_cache_stats()[k] - before[k] for k in ("hits", "misses")}
    assert d == {"hits": 1, "misses": 1}
    a = s1(*ex)
    b = s2(*ex)
    np.testing.assert_array_equal(np.asarray(a[0]["w"]), np.asarray(b[0]["w"]))


# --------------------------------------------------------------------------- #
# EMA
# --------------------------------------------------------------------------- #


def test_ema_matches_scalar_recurrence():
    from accvlab_tpu.models.train_utils import ema_init, ema_update

    params = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(0.0)}
    ema = ema_init(params)
    decay = 0.9
    # three updates toward changing params; compare vs the scalar recurrence
    expect_w = np.array([1.0, 2.0])
    expect_b = 0.0
    for i in range(1, 4):
        params = {"w": jnp.asarray([1.0 * i, 2.0 * i]), "b": jnp.asarray(float(i))}
        ema = ema_update(ema, params, decay=decay)
        expect_w = decay * expect_w + (1 - decay) * np.array([1.0 * i, 2.0 * i])
        expect_b = decay * expect_b + (1 - decay) * float(i)
    np.testing.assert_allclose(np.asarray(ema["w"]), expect_w, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ema["b"]), expect_b, rtol=1e-6)


def test_ema_warmup_correction_tracks_early_params():
    from accvlab_tpu.models.train_utils import ema_init, ema_update

    ema = ema_init({"w": jnp.zeros(())})
    params = {"w": jnp.asarray(10.0)}
    # step 0: effective decay = min(0.999, 1/10) = 0.1 -> ema ~ 9.0
    ema = ema_update(ema, params, decay=0.999, step=0)
    np.testing.assert_allclose(float(ema["w"]), 9.0, rtol=1e-6)
    # late step: effective decay saturates at the configured value
    ema2 = ema_update(ema_init({"w": jnp.zeros(())}), params, decay=0.999, step=10_000)
    np.testing.assert_allclose(float(ema2["w"]), 10.0 * (1 - 0.999), rtol=1e-4)


def test_ema_integer_leaves_pass_through_and_jit_composes():
    from accvlab_tpu.models.train_utils import ema_init, ema_update

    params = {"w": jnp.asarray([1.0]), "step": jnp.asarray(7, jnp.int32)}
    ema = ema_init(params)
    params2 = {"w": jnp.asarray([3.0]), "step": jnp.asarray(8, jnp.int32)}
    out = jax.jit(lambda e, p: ema_update(e, p, decay=0.5))(ema, params2)
    np.testing.assert_allclose(np.asarray(out["w"]), [2.0])
    assert int(out["step"]) == 8  # integer leaf tracks params, not averaged


def test_ema_params_serve_via_export(tmp_path):
    """EMA weights flow through the serving exporter unchanged (the
    production pattern: train with params, ship ema_params)."""
    from accvlab_tpu.models.serving import load_inference, save_inference
    from accvlab_tpu.models.train_utils import ema_init, ema_params, ema_update

    w = {"k": jnp.asarray([[2.0, 0.0], [0.0, 2.0]])}
    ema = ema_update(ema_init(w), {"k": jnp.asarray([[4.0, 0.0], [0.0, 4.0]])}, decay=0.5)
    apply_fn = lambda p, x: x @ p["k"]
    path = str(tmp_path / "ema.accvserve")
    save_inference(path, apply_fn, ema_params(ema), np.ones((1, 2), np.float32))
    out = load_inference(path)(np.ones((1, 2), np.float32))
    np.testing.assert_allclose(np.asarray(out), [[3.0, 3.0]])  # 0.5*2+0.5*4


def test_ema_init_survives_donated_step():
    """ema_init must COPY: the production train step donates its param
    buffers, and an aliased EMA would be deleted with them."""
    from accvlab_tpu.models.train_utils import ema_init

    params = {"w": jnp.ones((4,))}
    ema = ema_init(params)
    step = jax.jit(
        lambda p: jax.tree_util.tree_map(lambda x: x * 2.0, p), donate_argnums=0
    )
    step(params)  # params' buffers may now be deleted (donated)
    np.testing.assert_allclose(np.asarray(ema["w"]), 1.0)
