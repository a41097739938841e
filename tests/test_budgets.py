"""Budget auto-sizing: demand counters, probe exactness, sizing, escalation.

The invariant under test (models/budgets.py): every compaction budget is
EXACT while it covers its measured demand, demand <= budget <=> the matching
overflow counter is 0, and escalation restores exactness from any starved
configuration in finitely many doublings (saturating at dense).
"""

import dataclasses as dc

import jax
import numpy as np
import pytest

from nefii_tpu.models import budgets
from nefii_tpu.models.idr import DEMAND_KEYS

from test_idr_forward import _inputs, _model

jax.config.update("jax_enable_x64", False)


S = 256  # large enough that the min-128 budget clamps don't force dense


@pytest.fixture(scope="module")
def model_params_inputs():
    model = _model()
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _inputs(S=S)
    return model, params, inputs


def _overflows(out):
    return {k: int(v) for k, v in out.items() if k.endswith("_overflow")}


def _rgb_keys(out):
    return {k: np.asarray(v) for k, v in out.items()
            if k in ("sg_rgb_values", "idr_rgb_values", "network_object_mask",
                     "sg_diffuse_rgb_values", "sg_specular_rgb_values")}


def test_probe_is_exact_and_emits_demands(model_params_inputs):
    model, params, inputs = model_params_inputs
    key = jax.random.PRNGKey(7)
    dense = model.forward(params, inputs, key)
    probe = budgets.probe_model(model)
    out = probe.forward(params, inputs, key)

    # probe == dense bit-for-bit (the measure-mode phase split is a
    # semantic identity; demand counters are pure reads)
    for k, v in _rgb_keys(dense).items():
        np.testing.assert_array_equal(np.asarray(out[k]), v, err_msg=k)

    demands = {k: int(out[k]) for k in DEMAND_KEYS}
    assert all(k in out for k in DEMAND_KEYS)
    # this scene must exercise the big paths, else the test is vacuous
    assert demands["sampler_demand"] > 0
    assert demands["cull_demand"] > 0
    assert demands["secondary_sampler_demand"] > 0
    assert demands["shade_demand"] > 0
    # above-horizon count is bounded by the fan-out
    assert demands["cull_demand"] <= 3 * S
    # dense run has no overflow
    assert not any(_overflows(dense).values())


def test_budget_at_demand_is_exact_below_overflows(model_params_inputs):
    base, params, inputs = model_params_inputs
    # more trace iterations so most rays CONVERGE (the geometric-init SDF at
    # 5 iters leaves every ray unconverged, demand == N, and a budget < N
    # could then never be exact)
    model = dc.replace(
        base, ray_tracer=dc.replace(base.ray_tracer, sphere_tracing_iters=8))
    key = jax.random.PRNGKey(7)
    probe = budgets.probe_model(model)
    out = probe.forward(params, inputs, key)
    d_sampler = int(out["sampler_demand"])
    assert 0 < d_sampler < S
    dense = model.forward(params, inputs, key)

    # budget == demand: overflow 0 and outputs identical to dense
    tr = dc.replace(model.ray_tracer, sampler_budget=d_sampler)
    m_exact = dc.replace(model, ray_tracer=tr)
    out_b = m_exact.forward(params, inputs, key)
    assert int(out_b["sampler_overflow"]) == 0
    for k, v in _rgb_keys(dense).items():
        np.testing.assert_array_equal(np.asarray(out_b[k]), v, err_msg=k)

    # budget == demand - 1: exactly one ray overflows
    tr = dc.replace(model.ray_tracer, sampler_budget=d_sampler - 1)
    out_u = dc.replace(model, ray_tracer=tr).forward(params, inputs, key)
    assert int(out_u["sampler_overflow"]) == 1


def test_size_from_demand_zero_overflow_and_exact(model_params_inputs):
    model, params, inputs = model_params_inputs
    key = jax.random.PRNGKey(7)
    probe = budgets.probe_model(model)
    out = probe.forward(params, inputs, key)
    demands = {k: int(out[k]) for k in DEMAND_KEYS}
    dims = budgets.BudgetDims.for_chunk(S, 1, model.fast_multi_ray)

    sized = budgets.size_from_demand(
        model, demands, dims, margin=1.0, pad=16, cull_margin=1.0)
    # the sizing must actually compact something at this scale
    assert (sized.secondary_fraction < 1.0
            or sized.secondary_ray_tracer.sampler_budget is not None)
    out_s = sized.forward(params, inputs, key)
    assert not any(_overflows(out_s).values()), _overflows(out_s)
    dense = model.forward(params, inputs, key)
    for k, v in _rgb_keys(dense).items():
        np.testing.assert_array_equal(np.asarray(out_s[k]), v, err_msg=k)


def test_starved_budgets_escalate_to_exact(model_params_inputs):
    """The renderer's re-render loop: start deliberately starved, escalate
    on overflow until the counters read zero, and land on the dense result."""
    model, params, inputs = model_params_inputs
    key = jax.random.PRNGKey(7)
    dense = model.forward(params, inputs, key)

    tr = dc.replace(model.ray_tracer, sampler_budget=2, rootfind_budget=2)
    sec = dc.replace(model.ray_tracer, sampler_budget=4)
    m = dc.replace(model, ray_tracer=tr, secondary_ray_tracer=sec,
                   secondary_fraction=0.3, indirect_fraction=0.3,
                   shade_fraction=0.6)
    dims = budgets.BudgetDims.for_chunk(S, 1, model.fast_multi_ray)

    for attempt in range(24):
        out = m.forward(params, inputs, key)
        ovf = _overflows(out)
        if not any(ovf.values()):
            break
        m, changed = budgets.escalate(m, ovf, dims.n_primary, dims.n_secondary)
        assert changed, f"stuck with overflow {ovf}"
    else:
        raise AssertionError("did not converge in 24 escalations")
    assert attempt > 0  # the starved start must actually overflow
    for k, v in _rgb_keys(dense).items():
        np.testing.assert_array_equal(np.asarray(out[k]), v, err_msg=k)


def test_escalate_cull_and_saturation():
    model = _model()
    m = dc.replace(model, secondary_fraction=0.4)
    m2, changed = budgets.escalate(m, {"cull_overflow": 5}, 256)
    assert m2.secondary_fraction == pytest.approx(0.8) and changed
    m3, changed = budgets.escalate(m2, {"cull_overflow": 5}, 256)
    assert m3.secondary_fraction == 1.0 and changed
    # saturated: nothing left to escalate
    m4, changed = budgets.escalate(m3, {"cull_overflow": 5}, 256)
    assert not changed

    # fully dense model: no knob can fire
    _, changed = budgets.escalate(
        model, {k: 1 for k in ("sampler_overflow", "cull_overflow",
                               "secondary_overflow")}, 256)
    assert not changed


def test_size_from_demand_dense_cutoff():
    model = _model()
    dims = budgets.BudgetDims(256, 256, 768)
    demands = {k: 10_000 for k in DEMAND_KEYS}  # demand >> axis: stay dense
    sized = budgets.size_from_demand(model, demands, dims)
    assert sized.ray_tracer.sampler_budget is None
    assert sized.secondary_ray_tracer.sampler_budget is None
    assert sized.shade_fraction == 1.0
    assert sized.indirect_fraction == 1.0
    assert sized.secondary_fraction == 1.0
