"""Activation-sharding constraints under the (dp, fsdp, tp) mesh.

Round-1 dryruns emitted XLA "Involuntary full rematerialization" warnings:
GSPMD flip-flopped activation layouts between the forward and jvp/transpose
graphs because nothing pinned them. ``parallel.mesh.constrain`` now pins the
module seams; these tests assert the compiled programs actually produce the
pinned layouts (via jit(...).lower().compile() inspection) and that the
constraint machinery is a no-op without an active mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from llava_plus_tpu.models import llava as llava_model
from llava_plus_tpu.models.configs import tiny_llava_config
from llava_plus_tpu.parallel.mesh import activate_mesh, constrain, make_mesh
from llava_plus_tpu.parallel.sharding import llava_param_specs
from llava_plus_tpu.train.step import place_batch, place_params

from tests.test_train_step import _tiny_batch


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(2, 2, 2)


@pytest.fixture(scope="module")
def setup(mesh):
    cfg = tiny_llava_config()
    params = llava_model.init_params(
        cfg, jax.random.PRNGKey(0), dtype=jnp.float32
    )
    params = place_params(params, mesh, cfg)
    batch = place_batch(_tiny_batch(cfg), mesh)
    return cfg, params, batch


def _spec_of(sharding, mesh):
    """Normalize a (Named|GSPMD)Sharding to a PartitionSpec-like tuple."""
    if isinstance(sharding, NamedSharding):
        return tuple(sharding.spec)
    return None


def test_fused_embeds_sharded_over_batch(setup, mesh):
    cfg, params, batch = setup

    def fused(params, batch):
        with activate_mesh(mesh):
            return llava_model.fuse(params, cfg, batch)

    compiled = jax.jit(fused).lower(params, batch).compile()
    (out_sharding,) = jax.tree.leaves(compiled.output_shardings)
    expected = NamedSharding(mesh, P(("dp", "fsdp"), None, None))
    assert out_sharding.is_equivalent_to(expected, 3), out_sharding


def test_logits_sharded_batch_and_tp(setup, mesh):
    cfg, params, batch = setup

    def fwd(params, batch):
        with activate_mesh(mesh):
            logits, _ = llava_model.forward(params, cfg, batch, attn_impl="xla")
            return logits

    compiled = jax.jit(fwd).lower(params, batch).compile()
    (out_sharding,) = jax.tree.leaves(compiled.output_shardings)
    expected = NamedSharding(mesh, P(("dp", "fsdp"), None, "tp"))
    assert out_sharding.is_equivalent_to(expected, 3), out_sharding


def test_constrain_noop_without_mesh():
    x = jnp.ones((4, 4))
    y = constrain(x, ("dp", "fsdp"), None)
    assert y is x


def test_constrain_drops_unknown_axes(mesh):
    # A model written with ("dp","fsdp","tp") names must run on a mesh that
    # only has some of them.
    small = make_mesh(2, 1, 1, devices=jax.devices()[:2])

    def f(x):
        with activate_mesh(small):
            return constrain(x, ("dp", "fsdp"), "model_axis_that_does_not_exist")

    x = jnp.ones((8, 8))
    out = jax.jit(f)(x)
    np.testing.assert_array_equal(np.asarray(out), np.ones((8, 8)))


def test_sharded_step_matches_single_device(setup, mesh):
    """The constrained sharded step is numerically identical to the
    unconstrained single-device step."""
    from llava_plus_tpu.train.optimizer import OptimizerConfig, build_optimizer
    from llava_plus_tpu.train.step import init_opt_state, make_train_step

    cfg, params_sharded, batch_sharded = setup
    params = jax.device_get(params_sharded)
    batch = jax.device_get(batch_sharded)
    opt_cfg = OptimizerConfig(
        learning_rate=1e-3, total_steps=10, warmup_ratio=0.0,
        schedule="constant",
    )

    opt = build_optimizer(params, opt_cfg)
    step_plain = make_train_step(cfg, opt, remat=False)
    step_mesh = make_train_step(cfg, opt, remat=False, mesh=mesh)

    _, _, m_plain = step_plain(
        jax.tree.map(jnp.asarray, params), opt.init(params),
        jax.tree.map(jnp.asarray, batch),
    )
    _, _, m_mesh = step_mesh(
        params_sharded, init_opt_state(opt, params_sharded), batch_sharded
    )
    np.testing.assert_allclose(
        float(m_plain["loss"]), float(m_mesh["loss"]), rtol=1e-5
    )
