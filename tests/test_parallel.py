"""Mesh/sharding tests on the virtual 8-device CPU mesh: pair-parallel
matching produces shard-identical results to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gluefactory_tpu.models import get_model
from gluefactory_tpu.parallel.mesh import make_mesh
from gluefactory_tpu.parallel.pair_matching import make_pair_matcher
from test_models import make_matching_data


class TestPairParallelMatching:
    def test_sharded_matches_single(self, rng):
        model = get_model("lightglue").from_conf(
            {"n_layers": 2, "descriptor_dim": 64, "input_dim": 64, "num_heads": 2}
        )
        data, _, _ = make_matching_data(rng, b=8, n=32, d=64)
        variables = model.init(jax.random.PRNGKey(0), data)

        mesh = make_mesh()
        assert mesh.devices.size == 8
        match_pairs = make_pair_matcher(model, variables, mesh)
        pred_sharded = match_pairs(data)

        pred_single = model.apply(variables, data)
        np.testing.assert_allclose(
            np.asarray(pred_sharded["log_assignment"]),
            np.asarray(pred_single["log_assignment"]),
            atol=2e-3,
        )
        m_s = np.asarray(pred_sharded["matches0"])
        m_r = np.asarray(pred_single["matches0"])
        assert (m_s == m_r).mean() > 0.98

    def test_sharding_layout(self, rng):
        """The pair axis really lands sharded on the mesh."""
        model = get_model("nearest_neighbor_matcher").from_conf({})
        data, _, _ = make_matching_data(rng, b=8, n=16, d=32)
        mesh = make_mesh()
        match_pairs = make_pair_matcher(model, {}, mesh)
        pred = match_pairs(data)
        shard_devices = {s.device for s in pred["matches0"].addressable_shards}
        assert len(shard_devices) == 8


if __name__ == "__main__":
    pytest.main([__file__, "-v", "-x"])
