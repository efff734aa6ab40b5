"""Neighbor-search oracle tests vs O(N^2) brute force (SURVEY.md §4 item b)."""

import jax
import jax.numpy as jnp
import numpy as np

from wcsph_tpu.config import SimConfig
from wcsph_tpu.neighbors import build_neighbors, brute_force_neighbors
from wcsph_tpu import scene


def _cfg(**kw):
    base = dict(
        domain_min=(-0.5, -0.5, -0.5),
        domain_max=(0.5, 0.5, 0.5),
        particle_radius=0.025,
        cell_capacity=32,
        max_neighbors=96,
    )
    base.update(kw)
    return SimConfig(**base)


def _check_against_oracle(pos, n_liquid, cfg):
    nbr = jax.jit(build_neighbors, static_argnums=(1, 2))(
        jnp.asarray(pos.T), n_liquid, cfg)
    assert int(nbr.overflow) == 0
    oracle = brute_force_neighbors(pos, n_liquid, cfg.support_radius)
    idx = np.asarray(nbr.idx).T
    mask = np.asarray(nbr.mask).T
    count = np.asarray(nbr.count)
    for i in range(n_liquid):
        got = set(idx[i][mask[i]].tolist())
        assert got == oracle[i], f"particle {i}: {got ^ oracle[i]}"
        assert count[i] == len(oracle[i])


def test_random_cloud_matches_oracle():
    rng = np.random.default_rng(42)
    pos = rng.uniform(-0.45, 0.45, size=(300, 3)).astype(np.float32)
    _check_against_oracle(pos, 200, _cfg())


def test_lattice_matches_oracle():
    sc = scene.dam_break(fluid_dims=(5, 5, 5), box_extent=0.9)
    cfg = _cfg(cell_capacity=40, max_neighbors=128)
    _check_against_oracle(sc.positions, sc.n_liquid, cfg)


def test_out_of_domain_particles_are_isolated():
    cfg = _cfg()
    pos = np.array(
        [[0.0, 0.0, 0.0], [0.02, 0.0, 0.0], [5.0, 5.0, 5.0]], np.float32)
    nbr = build_neighbors(jnp.asarray(pos.T), 3, cfg)
    idx, mask = np.asarray(nbr.idx).T, np.asarray(nbr.mask).T
    assert set(idx[0][mask[0]]) == {1}
    assert set(idx[1][mask[1]]) == {0}
    assert not mask[2].any()  # out-of-box: no neighbors (HashGrid check_in_box)


def test_overflow_reported():
    # 80 coincident particles exceed both cell capacity and K in a tiny config
    pos = np.zeros((80, 3), np.float32)
    cfg = _cfg(cell_capacity=8, max_neighbors=4)
    nbr = build_neighbors(jnp.asarray(pos.T), 80, cfg)
    assert int(nbr.overflow) > 0


def test_neighbor_symmetry_on_liquid():
    rng = np.random.default_rng(7)
    pos = rng.uniform(-0.4, 0.4, size=(150, 3)).astype(np.float32)
    cfg = _cfg()
    nbr = build_neighbors(jnp.asarray(pos.T), 150, cfg)
    idx, mask = np.asarray(nbr.idx).T, np.asarray(nbr.mask).T
    sets = [set(idx[i][mask[i]].tolist()) for i in range(150)]
    for i in range(150):
        for j in sets[i]:
            assert i in sets[j]
