"""path_samples > 1: chain replication vs the reference's branching tree
(tracing.rs:310-318).

The reference averages `path_samples` recursive branches at EVERY
recursion level (a branching tree); the rebuild replicates each camera
sample into `path_samples` independent linear chains (driver
render_chunk_core). Both are unbiased estimators of the same rendering
equation — identical expectation, different variance allocation
(integrator.py docstring). This test verifies that claim statistically
on a closed-form scene: camera inside a lambertian+emissive sphere,
where the depth-d expectation is E·Σ_{k<d} albedo^k (each bounce's
expected weight is E[2·a·cosθ] = a under uniform-hemisphere sampling,
pdf 1/2π, brdf a/π — materials.rs:41-42,177)."""

import numpy as np
import jax.numpy as jnp

from cs397raytracingsp22_tpu import Camera, Lambertian, Scene, Sphere
from cs397raytracingsp22_tpu.render import integrator

ALBEDO = 0.7
EMIT = 1.0
DEPTH = 4
N_BRANCH = 3  # path_samples
# The reference scatters along UNNORMALIZED half-ball vectors
# (sample_hemisphere builds on rand_sphere_vec without normalizing,
# materials.rs:171-178, tracing.rs:72-80) and its dot_term uses that
# unnormalized direction (tracing.rs:313) — so each bounce's expected
# weight is 2a·E[|v|cosθ] = 2a·(3/4)·(1/2) = 0.75a, not a. Both the
# branching tree and our chains replicate this exactly.
BOUNCE_W = 0.75 * ALBEDO
ANALYTIC = EMIT * sum(BOUNCE_W ** k for k in range(DEPTH))


def _hemisphere(rng, normals):
    """The reference's scatter distribution: uniform UNNORMALIZED ball
    vector folded into the normal's hemisphere (materials.rs:171-178)."""
    n = normals.shape[0]
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v *= rng.uniform(0, 1, (n, 1)) ** (1.0 / 3.0)  # uniform in ball
    flip = np.sum(v * normals, axis=1) < 0.0
    v[flip] -= 2.0 * np.sum(v[flip] * normals[flip], axis=1, keepdims=True) * normals[flip]
    return v


def _tree_estimate(rng, n_primary, radius=100.0):
    """Vectorized numpy port of the reference's branching shade_ray
    (tracing.rs:300-324) for the sphere-furnace scene: at every level
    each ray spawns N_BRANCH child rays whose contributions average."""
    o = np.zeros((n_primary, 3))
    d = _hemisphere(rng, np.tile(np.array([[0.0, 0.0, 1.0]]), (n_primary, 1)))

    def shade(o, d, depth):
        m = o.shape[0]
        if depth >= DEPTH:
            return np.zeros(m)
        # ray-sphere from inside: |o + t d| = radius (d may be non-unit)
        a = np.sum(d * d, axis=1)
        b = 2.0 * np.sum(o * d, axis=1)
        c = np.sum(o * o, axis=1) - radius * radius
        t = (-b + np.sqrt(b * b - 4 * a * c)) / (2.0 * a)
        p = o + t[:, None] * d
        n = -p / radius  # inward normal
        # branch: (1/N) Σ dot·(brdf/pdf)·L_child  (tracing.rs:309-321)
        acc = np.zeros(m)
        for _ in range(N_BRANCH):
            nd = _hemisphere(rng, n)
            cos = np.clip(np.abs(np.sum(nd * n, axis=1)), 0.0, 1.0)
            child = shade(p, nd, depth + 1)
            acc += cos * (ALBEDO / np.pi) * child / (1.0 / (2.0 * np.pi))
        return EMIT + acc / N_BRANCH

    return shade(o, d, 0)


def _chain_estimate(seed, n_primary, radius=100.0):
    """Our estimator: N_BRANCH independent linear chains per camera
    sample through the real integrator (driver replication scheme)."""
    scene = Scene(
        camera=Camera(eyepoint=(0, 0, 0), view_dir=(0, 0, 1), up=(0, 1, 0)),
        objects=[
            Sphere(
                center=(0.0, 0.0, 0.0), radius=radius,
                material=Lambertian(
                    albedo=(ALBEDO,) * 3, emission=(EMIT,) * 3
                ),
            )
        ],
    )
    data = scene.compile()
    rng = np.random.default_rng(seed)
    d0 = _hemisphere(
        rng, np.tile(np.array([[0.0, 0.0, 1.0]]), (n_primary, 1))
    ).astype(np.float32)
    o = jnp.repeat(jnp.zeros((n_primary, 3), jnp.float32), N_BRANCH, axis=0)
    d = jnp.repeat(jnp.asarray(d0), N_BRANCH, axis=0)
    uids = jnp.arange(n_primary * N_BRANCH, dtype=jnp.int32)
    rad, _ = integrator.path_trace(
        data, o, d, uids, seed, DEPTH, max_trace_dist=1e4
    )
    per_chain = np.asarray(rad)[:, 0].reshape(n_primary, N_BRANCH)
    return per_chain.mean(axis=1)


def test_tree_and_chain_same_expectation():
    n = 4096
    tree = _tree_estimate(np.random.default_rng(11), n)
    chain = _chain_estimate(5, n)

    # each mean must agree with the closed form within 4 standard errors
    for name, est in [("tree", tree), ("chain", chain)]:
        se = est.std() / np.sqrt(n)
        assert abs(est.mean() - ANALYTIC) < 4 * se + 1e-3, (
            name, est.mean(), ANALYTIC, se
        )
    # and with each other
    se_both = np.hypot(tree.std(), chain.std()) / np.sqrt(n)
    assert abs(tree.mean() - chain.mean()) < 4 * se_both, (
        tree.mean(), chain.mean(), se_both
    )


def test_variance_allocation_documented():
    """The declared substitution trades variance: the branching tree
    averages N^k leaves at depth k (lower per-camera-sample variance)
    while chains average N full paths (costing N·d segments vs Σ N^k).
    Verify the direction holds — tree variance per camera sample below
    chain variance — so the docstring's claim is measured, not assumed."""
    n = 4096
    tree = _tree_estimate(np.random.default_rng(3), n)
    chain = _chain_estimate(9, n)
    assert tree.var() < chain.var(), (tree.var(), chain.var())
