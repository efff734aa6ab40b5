"""pcisph under the resident slab decomposition (one solver per file so a
cold-cache pytest process stays under the ~5 min budget — the shared
body lives in tests/_slab_utils.run_solver_slab)."""

from _slab_utils import mesh8, run_solver_slab  # noqa: F401


def test_resident_slab_pcisph(mesh8):
    run_solver_slab(mesh8, "pcisph")
