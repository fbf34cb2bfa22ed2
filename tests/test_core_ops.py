import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusion_models_dev_project_tpu.ops import (
    cg, tweedy, ddim, eps_pred_from_s, VESDE, VPSDE, DDPM,
    score_time_grid, ddpm_time_pairs, schedule_jump,
)


# ---------------------------------------------------------------- CG solver
def test_cg_solves_spd_system(rng):
    # (I + gamma A^T A) x = rhs with a random dense A
    B, N = 3, 16
    A = rng.normal(size=(N, N)).astype(np.float32) * 0.3
    gamma = 0.5
    M = np.eye(N, dtype=np.float32) + gamma * A.T @ A
    x_true = rng.normal(size=(B, N, 1, 1)).astype(np.float32)
    rhs = np.einsum("ij,bjkl->bikl", M, x_true)

    def op(v):
        return v + gamma * jnp.einsum("ij,bjkl->bikl", jnp.asarray(A.T @ A), v)

    x = cg(op, jnp.zeros_like(jnp.asarray(rhs)), jnp.asarray(rhs), n_iter=N)
    resid = np.linalg.norm(np.asarray(op(x) - rhs)) / np.linalg.norm(rhs)
    assert resid < 5e-3, resid  # fp32 CG stagnation floor
    # over-iterating a converged system must stay finite (NaN guard)
    x2 = cg(op, jnp.zeros_like(jnp.asarray(rhs)), jnp.asarray(rhs), n_iter=64)
    assert np.isfinite(np.asarray(x2)).all()


def test_cg_jits():
    def op(v):
        return 2.0 * v

    f = jax.jit(lambda r: cg(op, jnp.zeros_like(r), r, n_iter=3))
    r = jnp.ones((1, 4, 4, 1))
    np.testing.assert_allclose(np.asarray(f(r)), 0.5 * np.ones((1, 4, 4, 1)), rtol=1e-5)


# ---------------------------------------------------------------- Tweedie
def test_tweedy_recovers_x0_with_oracle_score():
    """With the exact score of a known Gaussian-corrupted x0, Tweedie returns x0."""
    sde = VPSDE(0.1, 10.0)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(key, (2, 8, 8, 1))
    t = jnp.array([0.4, 0.7])
    m = sde.marginal_prob_mean(t).reshape(-1, 1, 1, 1)
    std = sde.marginal_prob_std(t).reshape(-1, 1, 1, 1)
    z = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    xt = m * x0 + std * z
    score = -z / std  # exact conditional score
    np.testing.assert_allclose(np.asarray(tweedy(score, xt, sde, t)), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


def test_tweedy_epsilon_family():
    sde = DDPM(num_steps=100)
    key = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(key, (2, 8, 8, 1))
    t = jnp.array([50, 80])
    m = sde.marginal_prob_mean(t).reshape(-1, 1, 1, 1)
    std = sde.marginal_prob_std(t).reshape(-1, 1, 1, 1)
    z = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    xt = m * x0 + std * z
    np.testing.assert_allclose(np.asarray(tweedy(z, xt, sde, t)), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- DDIM
def test_ddim_deterministic_eta0_vp_endpoint():
    """At eta=0 and t_prev -> 0 the VP DDIM update returns ~xhat."""
    sde = VPSDE(0.1, 10.0)
    key = jax.random.PRNGKey(0)
    xhat = jax.random.uniform(key, (1, 8, 8, 1))
    s = jax.random.normal(jax.random.PRNGKey(3), xhat.shape)
    t = jnp.array([0.5])
    t_prev = jnp.array([1e-5])
    out = ddim(sde, s, xhat, t, t_prev, eta=0.0, key=jax.random.PRNGKey(9))
    np.testing.assert_allclose(np.asarray(out), np.asarray(xhat), atol=2e-2)


def test_ddim_ddpm_nan_guard_final_step():
    """t_prev = -1 gives mean_prev = 1 -> tbeta = 0/0; guard must zero it."""
    sde = DDPM(num_steps=100)
    xhat = jnp.ones((1, 4, 4, 1))
    s = jnp.zeros_like(xhat)
    out = ddim(sde, s, xhat, jnp.array([50]), jnp.array([-1]), eta=0.85,
               key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.ones((1, 4, 4, 1)), atol=1e-5)


def test_ddim_ve_simplified_vs_full():
    sde = VESDE(0.01, 100.0)
    key = jax.random.PRNGKey(0)
    xhat = jax.random.uniform(key, (1, 8, 8, 1))
    s = jax.random.normal(jax.random.PRNGKey(1), xhat.shape) * 0.01
    t, tp = jnp.array([0.5]), jnp.array([0.499])
    o1 = ddim(sde, s, xhat, t, tp, eta=0.0, key=key, use_simplified_eqn=False)
    o2 = ddim(sde, s, xhat, t, tp, eta=0.0, key=key, use_simplified_eqn=True)
    assert np.isfinite(np.asarray(o1)).all() and np.isfinite(np.asarray(o2)).all()
    # both are xhat - std_prev*std_t*sqrt(1-...)*s ≈ close for small eta
    assert not np.allclose(np.asarray(o1), np.asarray(xhat))


# ---------------------------------------------------------------- time grids
def test_score_time_grid():
    g = score_time_grid(1000, 1e-3)
    assert g.shape == (1000,)
    assert g[0] == 1.0 and abs(g[-1] - 1e-3) < 1e-6
    assert np.all(np.diff(g) < 0)


def test_schedule_jump_trivial():
    ts = schedule_jump(10, 1, 1)
    assert ts == list(range(9, -2, -1))


def test_schedule_jump_time_travel():
    ts = schedule_jump(20, 2, 3)
    assert ts[0] == 19 and ts[-1] == -1
    assert all(abs(a - b) == 1 for a, b in zip(ts[:-1], ts[1:]))
    assert len(ts) > 21  # jumps add revisits


def test_ddpm_time_pairs_skip():
    pairs = ddpm_time_pairs(1000, 100)
    assert pairs.shape == (100, 2)
    assert pairs[0, 0] == 990 and pairs[-1, 1] == -1
    assert pairs[0, 1] == 980


def test_ddpm_time_pairs_early_stop():
    pairs = ddpm_time_pairs(1000, 100, early_stopping_pct=0.5)
    assert pairs.shape == (50, 2)


def test_eps_pred_from_s():
    s = jnp.ones((2, 2))
    np.testing.assert_allclose(np.asarray(eps_pred_from_s(s, 2.0)), -2 * np.ones((2, 2)))


def test_train_step_decreases_loss_both_families():
    """Jitted train step learns on a toy problem for score (VESDE) and
    epsilon (DDPM) objectives (reference losses.py:3-41)."""
    import jax
    import jax.numpy as jnp
    import optax

    from diffusion_models_dev_project_tpu.ops.sde import DDPM, VESDE
    from diffusion_models_dev_project_tpu.training.ema import ema_init
    from diffusion_models_dev_project_tpu.training.trainer import (
        TrainState, make_train_step)

    def tiny_apply(params, x, t):
        # linear "network": enough to reduce the loss from an init of zeros
        return x * params["w"].reshape(1, 1, 1, 1) + params["b"].reshape(1, 1, 1, 1)

    from diffusion_models_dev_project_tpu.training.losses import (
        epsilon_matching_loss, score_matching_loss)

    batch = jnp.ones((16, 8, 8, 1)) * 0.5
    probe_key = jax.random.PRNGKey(42)
    for sde in (VESDE(sigma_min=0.01, sigma_max=5.0), DDPM(num_steps=100)):
        loss_impl = (score_matching_loss if sde.prediction_type == "score"
                     else epsilon_matching_loss)

        def probe(params):
            model = lambda x, t: tiny_apply(params, x, t)
            return float(loss_impl(probe_key, batch, model, sde))

        params = {"w": jnp.zeros((1,)), "b": jnp.zeros((1,))}
        opt = optax.adam(3e-2)
        step = make_train_step(tiny_apply, sde, opt, ema_decay=0.999,
                               ema_warm_start_steps=2)
        state = TrainState(params, opt.init(params), ema_init(params),
                           jnp.zeros((), jnp.int32))
        before = probe(state.params)
        key = jax.random.PRNGKey(0)
        for i in range(60):
            key, sub = jax.random.split(key)
            state, loss = step(state, batch, sub)
        after = probe(state.params)
        assert after < before, (sde, before, after)
        # EMA warm start tracked then diverged from params
        assert np.isfinite(
            np.asarray(jax.tree_util.tree_leaves(state.ema.shadow)[0])).all()


def test_score_matching_loss_sigma_stratified():
    """sigma_alpha=0 is the exact reference loss; sigma_alpha>0 multiplies
    each per-sample term by 1 + alpha*(std/std_max)^2, so the reweighted
    loss is bounded by [1, 1+alpha] x the plain loss and increases
    monotonically with alpha (losses.score_matching_loss)."""
    import jax
    import jax.numpy as jnp

    from diffusion_models_dev_project_tpu.ops.sde import VESDE
    from diffusion_models_dev_project_tpu.training.losses import (
        score_matching_loss)

    sde = VESDE(sigma_min=0.01, sigma_max=10.0)
    model = lambda x, t: jnp.zeros_like(x)
    batch = jax.random.normal(jax.random.PRNGKey(3), (32, 8, 8, 1))
    key = jax.random.PRNGKey(7)
    plain = float(score_matching_loss(key, batch, model, sde))
    zero_alpha = float(score_matching_loss(key, batch, model, sde,
                                           sigma_alpha=0.0))
    assert plain == zero_alpha
    prev = plain
    for alpha in (1.0, 3.0, 5.0):
        w = float(score_matching_loss(key, batch, model, sde,
                                      sigma_alpha=alpha))
        assert prev < w <= (1.0 + alpha) * plain + 1e-6, (alpha, prev, w)
        prev = w


def test_woodbury_dc_solves_the_cg_system_exactly():
    """woodbury_dc must return the EXACT solution of
    (I + gamma AᵀA) x = xhat0 + gamma Aᵀ y for a matrix-backed operator
    (ops/woodbury.py), i.e. agree with a fully-converged CG."""
    import numpy as np
    import jax.numpy as jnp

    from diffusion_models_dev_project_tpu.physics.ray_trafo import (
        DenseRayTransform)
    from diffusion_models_dev_project_tpu.ops.woodbury import (
        build_woodbury_sinv, woodbury_dc)

    rng = np.random.default_rng(5)
    n_obs, h = 40, 12                       # obs dim < pixel dim (sparse CT)
    A = rng.standard_normal((n_obs, h * h)).astype(np.float32) * 0.3
    trafo = DenseRayTransform(jnp.asarray(A), im_shape=(h, h),
                              obs_shape=(5, 8))
    gamma = 0.05
    xhat0 = jnp.asarray(rng.standard_normal((2, h, h, 1)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 5, 8, 1)).astype(np.float32))

    sinv = build_woodbury_sinv(trafo, gamma)
    out = np.asarray(woodbury_dc(trafo, sinv, xhat0, y))

    # dense direct solve of the image-space normal equations
    M = np.eye(h * h, dtype=np.float64) + gamma * (A.T.astype(np.float64) @ A)
    for b in range(2):
        rhs = (np.asarray(xhat0)[b, :, :, 0].ravel()
               + gamma * A.T @ np.asarray(y)[b, :, :, 0].ravel())
        ref = np.linalg.solve(M, rhs)
        np.testing.assert_allclose(out[b, :, :, 0].ravel(), ref,
                                   rtol=2e-4, atol=2e-4)
