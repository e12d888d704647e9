"""HMC sampler tests: exactness on a Gaussian, self-consistency on DW4."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecnf_tpu.targets.mcmc import run_hmc, icosahedron_with_center
from ecnf_tpu.targets.energies import double_well_log_prob


class TestHMC:
    def test_gaussian_moments(self):
        """On an isotropic Gaussian target the chain must recover the
        first two moments accurately."""

        def log_prob(x):  # x: [C, N, D], standard normal per coordinate
            return -0.5 * jnp.sum(x**2, axis=(-1, -2))

        samples, acc = run_hmc(
            log_prob,
            jax.random.PRNGKey(0),
            n_samples_per_chain=100,
            n_chains=32,
            n_nodes=4,
            dim=2,
            step_size=0.3,
            n_leapfrog=8,
            burn_in=200,
            thin=5,
        )
        assert 0.4 < float(acc) <= 1.0
        flat = np.asarray(samples).reshape(-1)
        np.testing.assert_allclose(flat.mean(), 0.0, atol=0.05)
        np.testing.assert_allclose(flat.std(), 1.0, atol=0.05)

    @pytest.mark.slow
    def test_dw4_seed_consistency(self):
        """Two independent DW4 runs must produce matching energy
        distributions (the chains are sampling the same measure)."""

        def run(seed):
            s, acc = run_hmc(
                double_well_log_prob,
                jax.random.PRNGKey(seed),
                n_samples_per_chain=50,
                n_chains=32,
                n_nodes=4,
                dim=2,
                step_size=0.12,
                n_leapfrog=15,
                burn_in=800,
                thin=10,
            )
            assert float(acc) > 0.5
            return np.asarray(-double_well_log_prob(s))

        e1, e2 = run(1), run(2)
        np.testing.assert_allclose(e1.mean(), e2.mean(), atol=0.6)
        np.testing.assert_allclose(e1.std(), e2.std(), rtol=0.25)

    def test_icosahedron_geometry(self):
        x = icosahedron_with_center(4, jax.random.PRNGKey(0), noise=0.0)
        assert x.shape == (4, 13, 3)
        d = np.linalg.norm(np.asarray(x[0, 1:]) - np.asarray(x[0, 0]), axis=-1)
        np.testing.assert_allclose(d, 1.0, rtol=1e-5)  # unit circumradius

    def test_init_positions_respected(self):
        x0 = jnp.ones((8, 3, 2)) * 5.0

        def log_prob(x):
            return -0.5 * jnp.sum((x - 5.0) ** 2, axis=(-1, -2))

        samples, acc = run_hmc(
            log_prob,
            jax.random.PRNGKey(0),
            n_samples_per_chain=10,
            n_chains=8,
            n_nodes=3,
            dim=2,
            step_size=0.2,
            n_leapfrog=5,
            burn_in=50,
            thin=2,
            init_positions=x0,
        )
        # Samples hover around the target mean at 5 (started there).
        np.testing.assert_allclose(float(samples.mean()), 5.0, atol=0.3)
