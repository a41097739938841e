"""Head-to-head numerical parity with the PyTorch reference implementation.

Loads the reference IDRNetwork (/root/reference/code/model/
implicit_differentiable_renderer.py:244-759) on torch CPU, exports its
state_dict into our JAX param tree (utils/checkpoints.import_torch_idr), and
asserts the two implementations agree:

  * ImplicitNetwork sdf/feature/gradient          (reference :18-123)
  * RenderingNetwork radiance                     (reference :126-241)
  * EnvmapMaterialNetwork materials               (sg_envmap_material.py:46-447)
  * render_with_sg closed-form shading            (sg_render.py:164-295)
  * RayTracing hit distances                      (ray_tracing.py:29-101)
  * full forward_with_uv, render_type="sg"        (PSNR >= 50 dB)

This is the BASELINE.md quality gate ("within 0.1 dB of reference renders")
made into a deterministic test: identical weights, identical rays, fp32 CPU.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ref_torch import REF_CODE, build_reference_idr, import_reference  # noqa: E402

from nefii_tpu.config import ConfigFactory  # noqa: E402
from nefii_tpu.models.idr import IDRNetwork  # noqa: E402
from nefii_tpu.utils import checkpoints  # noqa: E402


def _t(x):
    return torch.as_tensor(np.asarray(x), dtype=torch.float32)


def _n(x):
    return np.asarray(x.detach().numpy() if hasattr(x, "detach") else x, np.float32)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-30))


def _build_pair(conf_name):
    """(ref torch model, our model, our params w/ ref weights, conf)."""
    torch.manual_seed(0)
    ref, conf = build_reference_idr(f"{REF_CODE}/confs_sg/{conf_name}")
    ours_conf = ConfigFactory.parse_file(
        f"{REF_CODE}/confs_sg/{conf_name}"
    ).get_config("model")
    ours = IDRNetwork.from_conf(ours_conf)
    params = ours.init_params(jax.random.PRNGKey(0))
    params = checkpoints.import_torch_idr(params, ref.state_dict())
    return ref, ours, params, conf


@pytest.fixture(scope="module")
def pair():
    return _build_pair("conf.conf")


@pytest.fixture(scope="module")
def physg_pair():
    return _build_pair("physg.conf")


def _rand_points(n, seed=0, scale=0.8):
    rng = np.random.RandomState(seed)
    return rng.uniform(-scale, scale, (n, 3)).astype(np.float32)


def _rand_unit(n, seed=1):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# components
# ---------------------------------------------------------------------------

def test_implicit_network_parity(pair):
    ref, ours, params, _ = pair
    pts = _rand_points(256)
    ref_out = _n(ref.implicit_network(_t(pts)))
    our_out = np.asarray(ours.implicit_network(params["implicit_network"], jnp.asarray(pts)))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-4, atol=2e-5)


def test_implicit_gradient_parity(pair):
    ref, ours, params, _ = pair
    pts = _rand_points(128, seed=3)
    g_ref = _n(ref.implicit_network.gradient(_t(pts)))[:, 0, :]
    g_ours = np.asarray(ours.implicit_network.gradient(params["implicit_network"], jnp.asarray(pts)))
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-4)


def test_rendering_network_parity(pair):
    ref, ours, params, _ = pair
    n = 128
    pts, nrm, vd = _rand_points(n), _rand_unit(n, 1), _rand_unit(n, 2)
    feat = np.random.RandomState(4).normal(size=(n, ref.feature_vector_size)).astype(np.float32) * 0.1
    ref_rgb = _n(ref.rendering_network(_t(pts), _t(nrm), _t(vd), _t(feat)))
    our_rgb = np.asarray(
        ours.rendering_network(
            params["rendering_network"], jnp.asarray(pts), jnp.asarray(nrm),
            jnp.asarray(vd), jnp.asarray(feat),
        )
    )
    np.testing.assert_allclose(our_rgb, ref_rgb, rtol=1e-4, atol=2e-5)


def test_material_network_parity(pair):
    ref, ours, params, _ = pair
    n = 128
    pts, nrm = _rand_points(n, seed=5), _rand_unit(n, 6)
    feat = np.random.RandomState(7).normal(size=(n, ref.feature_vector_size)).astype(np.float32) * 0.1
    ref_mat = ref.envmap_material_network(_t(pts), _t(feat), _t(nrm))
    our_mat = ours.envmap_material_network(
        params["envmap_material_network"], jnp.asarray(pts), jnp.asarray(feat), jnp.asarray(nrm)
    )
    np.testing.assert_allclose(
        np.asarray(our_mat["sg_lgtSGs"]), _n(ref_mat["sg_lgtSGs"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(our_mat["sg_diffuse_albedo"]), _n(ref_mat["sg_diffuse_albedo"]),
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(our_mat["sg_roughness"]), _n(ref_mat["sg_roughness"]),
        rtol=1e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(our_mat["sg_specular_reflectance"]),
        _n(ref_mat["sg_specular_reflectance"]), rtol=1e-5, atol=1e-6,
    )


def test_render_with_sg_parity(pair):
    ref_sg = import_reference("model.sg_render")
    from nefii_tpu.ops.sg import render_with_sg as ours_sg

    _, _, params, _ = pair
    lgtSGs = np.asarray(params["envmap_material_network"]["lgtSGs"])
    n = 256
    rng = np.random.RandomState(8)
    nrm, vd = _rand_unit(n, 9), _rand_unit(n, 10)
    albedo = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    rough = np.asarray([[0.4]], np.float32)
    spec = np.asarray([[0.3, 0.35, 0.4]], np.float32)

    ref_out = ref_sg.render_with_sg(
        _t(lgtSGs), _t(spec), _t(rough), _t(albedo), _t(nrm), _t(vd)
    )
    our_out = ours_sg(
        jnp.asarray(lgtSGs), jnp.asarray(spec), jnp.asarray(rough),
        jnp.asarray(albedo), jnp.asarray(nrm), jnp.asarray(vd),
    )
    for k in ("sg_rgb", "sg_specular_rgb", "sg_diffuse_rgb"):
        np.testing.assert_allclose(
            np.asarray(our_out[k]), _n(ref_out[k]), rtol=1e-5, atol=1e-5,
            err_msg=f"render_with_sg key {k}",
        )


def _camera(W=64, dist=2.5):
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = W * 1.2
    K[0, 2] = K[1, 2] = W / 2.0
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.0, 0.0, -dist]
    return K, pose


def _center_rays(n, W=64, seed=11):
    rng = np.random.RandomState(seed)
    return rng.uniform(W * 0.25, W * 0.75, (1, n, 2)).astype(np.float32)


def test_sphere_trace_parity(pair):
    """Same imported SDF, same rays: hit masks and distances must agree."""
    ref, ours, params, _ = pair
    W = 64
    K, pose = _camera(W)
    uv = _center_rays(96, W)

    ref_ray_mod = import_reference("utils.rend_util")
    ray_dirs_t, cam_loc_t = ref_ray_mod.get_camera_params(
        _t(uv), _t(pose[None]), _t(K[None])
    )
    obj_mask = torch.ones(uv.shape[1], dtype=torch.bool)

    ref.ray_tracer.eval()
    with torch.no_grad():
        pts_ref, hit_ref, dist_ref = ref.ray_tracer(
            sdf=lambda x: ref.implicit_network(x)[:, 0],
            cam_loc=cam_loc_t, object_mask=obj_mask, ray_directions=ray_dirs_t,
        )

    from nefii_tpu.utils.camera import get_camera_params

    ray_dirs, cam_loc = get_camera_params(
        jnp.asarray(uv), jnp.asarray(pose[None]), jnp.asarray(K[None])
    )
    sdf_fn = lambda x: ours.implicit_network(params["implicit_network"], x)[:, 0]
    res = ours.ray_tracer(
        sdf_fn, cam_loc, jnp.ones((uv.shape[1],), bool), ray_dirs, training=False
    )

    hit_ours = np.asarray(res.object_mask)
    hit_ref = _n(hit_ref).astype(bool)
    # masks must agree on ~all rays (boundary rays may flip either way)
    agree = hit_ours == hit_ref
    assert agree.mean() >= 0.97, f"hit masks agree on {agree.mean():.2%}"

    both = hit_ours & hit_ref
    assert both.sum() > 10, "degenerate scene: no common hits"
    np.testing.assert_allclose(
        np.asarray(res.dists)[both], _n(dist_ref)[both], rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

def test_forward_with_uv_sg_parity(physg_pair):
    """Full pixel pipeline, render_type='sg' (deterministic): PSNR >= 50 dB."""
    ref, ours, params, _ = physg_pair
    W = 64
    K, pose = _camera(W)
    uv = _center_rays(160, W, seed=12)
    obj_mask = np.ones((1, uv.shape[1]), bool)

    ref.eval()
    inp = {
        "uv": _t(uv),
        "intrinsics": _t(K[None]),
        "pose": _t(pose[None]),
        "object_mask": torch.as_tensor(obj_mask),
    }
    with torch.no_grad():
        ref_out = ref(inp)

    batch = {
        "uv": jnp.asarray(uv),
        "intrinsics": jnp.asarray(K[None]),
        "pose": jnp.asarray(pose[None]),
        "object_mask": jnp.asarray(obj_mask),
    }
    our_out = ours.forward(params, batch, jax.random.PRNGKey(0), training=False)

    hit_ref = _n(ref_out["network_object_mask"]).astype(bool)
    hit_ours = np.asarray(our_out["network_object_mask"])
    agree = hit_ours == hit_ref
    assert agree.mean() >= 0.99, f"hit masks agree on {agree.mean():.2%}"
    both = hit_ref & hit_ours
    assert both.sum() > 20, "degenerate scene: no common hits"

    # measured ~119-137 dB (max abs err ~5e-6) — gate at 80 dB for headroom
    for k in ("sg_rgb_values", "idr_rgb_values", "normal_values"):
        a = np.asarray(our_out[k])[both]
        b = _n(ref_out[k])[both]
        p = _psnr(a, b)
        assert p >= 80.0, f"{k}: PSNR {p:.1f} dB < 80 dB"


# ---------------------------------------------------------------------------
# path-tracing machinery: the deterministic core of the pt_render_* family
# (samplers are stochastic with different RNGs; their pdf functions, frame
# rotation, MIS weights and SG light evaluation are deterministic and must
# match the reference bitwise-close — path_tracing_render.py:12-414)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ptr_ref():
    return import_reference("model.path_tracing_render")


def _pt_inputs(n=257, m=16, seed=3):
    rng = np.random.RandomState(seed)
    normal = _rand_unit(n, seed)
    # viewdir in the normal's hemisphere, wi anywhere on the sphere
    view = _rand_unit(n, seed + 1)
    view = np.where(np.sum(view * normal, -1, keepdims=True) < 0, -view, view)
    wi = _rand_unit(n, seed + 2)
    rough = rng.uniform(0.1, 0.9, (n, 1)).astype(np.float32)
    lgt = rng.normal(size=(m, 7)).astype(np.float32)
    lgt[:, 3] = np.abs(lgt[:, 3]) * 20 + 1
    lgt[:, 4:] = np.abs(lgt[:, 4:])
    return wi, normal, view, rough, lgt


def test_rotate_to_normal_parity(ptr_ref):
    from nefii_tpu.ops import sampling

    _, normal, _, _, _ = _pt_inputs()
    rng = np.random.RandomState(11)
    xyz = rng.normal(size=normal.shape).astype(np.float32)
    ours = sampling.rotate_to_normal(jnp.asarray(xyz), jnp.asarray(normal))
    ref = ptr_ref.rotate_to_normal(_t(xyz), _t(normal))
    np.testing.assert_allclose(np.asarray(ours), _n(ref), rtol=1e-5, atol=1e-6)


def test_pdf_fns_parity(ptr_ref):
    from nefii_tpu.ops import sampling

    wi, normal, view, rough, lgt = _pt_inputs()
    # drop near-degenerate wi ~ -view pairs: the half-vector normalisation is
    # ill-conditioned there and both implementations emit fp noise (the EXACT
    # degenerate case has a defined fallback, asserted below)
    ok = np.linalg.norm(wi + view, axis=-1) > 1e-2
    wi, normal, view, rough = wi[ok], normal[ok], view[ok], rough[ok]
    pairs = [
        (sampling.pdf_fn_cos, ptr_ref.pdf_fn_cos),
        (sampling.pdf_fn_brdf_ggx, ptr_ref.pdf_fn_brdf_gxx),
        (sampling.pdf_fn_mix_sg, ptr_ref.pdf_fn_mix_sg),
    ]
    for ours_fn, ref_fn in pairs:
        ours = ours_fn(
            jnp.asarray(wi), jnp.asarray(normal), jnp.asarray(view),
            jnp.asarray(rough), jnp.asarray(lgt),
        )
        ref = ref_fn(_t(wi), _t(normal), _t(view), _t(rough), _t(lgt))
        # GGX pdfs reach O(10^2) on sharp lobes; 1e-3 relative covers fp32
        # op-order noise between the two stable-form evaluations
        np.testing.assert_allclose(
            np.asarray(ours), _n(ref), rtol=1e-3, atol=1e-6,
            err_msg=ours_fn.__name__,
        )

    # GGX degenerate case wi == -viewdir falls back to the normal (:109-111)
    ours = sampling.pdf_fn_brdf_ggx(
        jnp.asarray(-view), jnp.asarray(normal), jnp.asarray(view),
        jnp.asarray(rough), None,
    )
    ref = ptr_ref.pdf_fn_brdf_gxx(_t(-view), _t(normal), _t(view), _t(rough), None)
    np.testing.assert_allclose(np.asarray(ours), _n(ref), rtol=1e-4, atol=1e-6)


def test_pdf_mix_sg_shared_fast_path_parity(ptr_ref):
    """The TPU [N,M]-matmul fast path must match the reference broadcast."""
    from nefii_tpu.ops import sampling

    wi, normal, view, rough, lgt = _pt_inputs()
    ours = sampling.pdf_fn_mix_sg_shared(
        jnp.asarray(wi), jnp.asarray(normal), jnp.asarray(view),
        jnp.asarray(rough), jnp.asarray(lgt),
    )
    ref = ptr_ref.pdf_fn_mix_sg(_t(wi), _t(normal), _t(view), _t(rough), _t(lgt))
    np.testing.assert_allclose(np.asarray(ours), _n(ref), rtol=1e-4, atol=1e-6)


def test_pdf_constant_2d_light_parity(ptr_ref):
    from nefii_tpu.ops import sampling

    wi, normal, view, rough, _ = _pt_inputs()
    rng = np.random.RandomState(5)
    lgtMap = rng.uniform(0.0, 4.0, (32, 64, 3)).astype(np.float32)
    ours = sampling.pdf_fn_constant_2d_light(
        jnp.asarray(wi), jnp.asarray(normal), jnp.asarray(view),
        jnp.asarray(rough), jnp.asarray(lgtMap),
    )
    ref = ptr_ref.pdf_fn_constant_2d_light(
        _t(wi), _t(normal), _t(view), _t(rough), _t(lgtMap)
    )
    np.testing.assert_allclose(np.asarray(ours), _n(ref), rtol=1e-4, atol=1e-6)


def test_power_heuristic_and_sg_light_parity(ptr_ref):
    from nefii_tpu.ops import sampling

    wi, normal, view, rough, lgt = _pt_inputs()
    pdfs = [
        sampling.pdf_fn_cos(jnp.asarray(wi), jnp.asarray(normal), None, None, None),
        sampling.pdf_fn_brdf_ggx(
            jnp.asarray(wi), jnp.asarray(normal), jnp.asarray(view),
            jnp.asarray(rough), None,
        ),
        sampling.pdf_fn_mix_sg(
            jnp.asarray(wi), jnp.asarray(normal), jnp.asarray(view),
            jnp.asarray(rough), jnp.asarray(lgt),
        ),
    ]
    t_pdfs = [_t(np.asarray(p)) for p in pdfs]
    for idx in range(3):
        ours = sampling.power_heuristic_list([1.0, 2.0, 3.0], pdfs, idx)
        ref = ptr_ref.power_heuristic_list([1.0, 2.0, 3.0], t_pdfs, idx)
        np.testing.assert_allclose(np.asarray(ours), _n(ref), rtol=1e-5, atol=1e-7)

    # SG mixture radiance evaluation (the light term in every pt_render_*)
    lobes = lgt[:, :3] / np.linalg.norm(lgt[:, :3], axis=-1, keepdims=True)
    ref_light = ptr_ref.sg_fn(
        _t(wi).unsqueeze(-2), _t(lobes), _t(lgt[:, 3:4]), _t(lgt[:, 4:])
    ).sum(-2)
    ours_light = sampling.sg_light_eval(jnp.asarray(wi), jnp.asarray(lgt))
    np.testing.assert_allclose(np.asarray(ours_light), _n(ref_light), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# end-to-end MC-estimator parity with INJECTED COMMON SAMPLES (VERDICT r2 #1):
# the full pt_render_indirect_mlp chain — per-strategy pdfs, 3x3 MIS pdf
# matrix, ONE batched secondary trace through the learned SDF, visibility +
# indirect radiance at secondary hits, power-heuristic combine, and the
# secondary_points/mask/dir outputs — compared head-to-head against the
# reference (path_tracing_render.py:1255-1487, :2109-2166) on identical
# sample directions and identical weights.
# ---------------------------------------------------------------------------


def _surface_setup(pair, n_max=48, seed=20):
    """Shared shading points/normals/views/materials/sample directions.

    The init geometry is a near-convex sphere (geometric init), so secondary
    rays leaving the surface outward would never re-hit — no visibility or
    indirect path would be exercised. Instead, points sit OFF-surface at
    radius 0.9 with normals pointing INWARD at the object: hemisphere sample
    directions then split into genuine secondary hits (blocked -> indirect
    radiance) and misses (visible -> source light), covering every branch of
    the estimator."""
    n = n_max
    rng = np.random.RandomState(seed + 1)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = (0.9 * d).astype(np.float32)
    # inward normal, tilted a little so the hemispheres vary per point
    tilt = rng.normal(scale=0.3, size=(n, 3)).astype(np.float32)
    normal = -d + tilt
    normal /= np.linalg.norm(normal, axis=-1, keepdims=True)
    view = rng.normal(size=(n, 3)).astype(np.float32)
    view /= np.linalg.norm(view, axis=-1, keepdims=True)
    view = np.where(np.sum(view * normal, -1, keepdims=True) < 0, -view, view)
    rough = rng.uniform(0.2, 0.8, (n, 1)).astype(np.float32)
    spec = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    albedo = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    wis = []
    for s in range(3):
        w = rng.normal(size=(n, 3)).astype(np.float32)
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
        w = np.where(np.sum(w * normal, -1, keepdims=True) < 0, -w, w)
        wis.append(np.ascontiguousarray(w, np.float32))
    return pts, normal.astype(np.float32), view.astype(np.float32), rough, spec, albedo, wis


class _patched_ref_samplers:
    """Monkeypatch the reference module's samplers to return fixed wi with
    the pdf the strategy's canonical pdf function assigns — the same
    convention pt_render_core's wi_override uses."""

    def __init__(self, ptr, wt, env2d=False):
        self.ptr, self.wt, self.env2d = ptr, wt, env2d

    def __enter__(self):
        ptr, wt = self.ptr, self.wt
        self.saved = (
            ptr.cos_sampling, ptr.brdf_sampling, ptr.mix_sg_sampling,
            ptr.constant_2d_light_sampling,
        )
        ptr.cos_sampling = lambda normal: (
            wt[0], ptr.pdf_fn_cos(wt[0], normal, None, None, None)
        )
        ptr.brdf_sampling = lambda normal, rough, view: (
            wt[1], ptr.pdf_fn_brdf_gxx(wt[1], normal, view, rough, None)
        )
        ptr.mix_sg_sampling = lambda normal, lgt: (
            wt[2], ptr.pdf_fn_mix_sg(wt[2], normal, None, None, lgt)
        )
        ptr.constant_2d_light_sampling = lambda normal, lgtMap: (
            wt[2], ptr.pdf_fn_constant_2d_light(wt[2], normal, None, None, lgtMap)
        )
        return self

    def __exit__(self, *exc):
        (self.ptr.cos_sampling, self.ptr.brdf_sampling, self.ptr.mix_sg_sampling,
         self.ptr.constant_2d_light_sampling) = self.saved
        return False


def _assert_estimator_parity(ref_out, our_out, min_mask_agree=0.97, min_db=60.0):
    np.testing.assert_allclose(
        np.asarray(our_out["secondary_dir"]), _n(ref_out["secondary_dir"]), atol=1e-6
    )
    m_ref = _n(ref_out["secondary_mask"]).astype(bool)[..., 0]
    m_ours = np.asarray(our_out["secondary_mask"])[..., 0]
    agree = m_ours == m_ref
    assert agree.mean() >= min_mask_agree, f"secondary masks agree {agree.mean():.2%}"
    both = m_ref & m_ours
    assert both.sum() > 0, "no common secondary hits"
    np.testing.assert_allclose(
        np.asarray(our_out["secondary_points"])[both],
        _n(ref_out["secondary_points"]).reshape(m_ref.shape + (3,))[both],
        rtol=1e-3, atol=1e-3,
    )
    # full MIS estimate on rays where all strategies' hit masks agree
    # (boundary rays whose secondary trace flipped differ by construction)
    ok = agree.all(axis=0)
    assert ok.mean() >= 0.9, f"only {ok.mean():.2%} rays comparable"
    for k in ("sg_rgb", "sg_specular_rgb", "sg_diffuse_rgb"):
        p = _psnr(np.asarray(our_out[k])[ok], _n(ref_out[k])[ok])
        assert p >= min_db, f"{k}: PSNR {p:.1f} dB < {min_db}"


def test_pt_render_indirect_mlp_estimator_parity(pair):
    ref, ours, params, _ = pair
    pts, normal, view, rough, spec, albedo, wis = _surface_setup(pair)
    lgt = np.asarray(params["envmap_material_network"]["lgtSGs"], np.float32)
    ptr = import_reference("model.path_tracing_render")

    ref.eval()
    with _patched_ref_samplers(ptr, [_t(w) for w in wis]):
        with torch.no_grad():
            ref_out = ptr.pt_render_indirect_mlp(
                _t(lgt), _t(spec), _t(rough), _t(albedo),
                _t(normal), _t(view), _t(pts), ref,
            )

    from nefii_tpu.ops import path_tracing as our_ptr

    scene = ours.scene_fns(params)
    our_out = our_ptr.pt_render_core(
        jax.random.PRNGKey(0), jnp.asarray(lgt), jnp.asarray(spec),
        jnp.asarray(rough), jnp.asarray(albedo), jnp.asarray(normal),
        jnp.asarray(view), jnp.asarray(pts), scene,
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect",
        diff_geo=False, speed_first=True, training=False,
        wi_override=tuple(jnp.asarray(w) for w in wis),
    )
    _assert_estimator_parity(ref_out, our_out)

    # memsave variant (speed_first=False) on the same injected samples
    with _patched_ref_samplers(ptr, [_t(w) for w in wis]):
        with torch.no_grad():
            ref_ms = ptr.pt_render_indirect_mlp_memsave(
                _t(lgt), _t(spec), _t(rough), _t(albedo),
                _t(normal), _t(view), _t(pts), ref,
            )
    our_ms = our_ptr.pt_render_core(
        jax.random.PRNGKey(0), jnp.asarray(lgt), jnp.asarray(spec),
        jnp.asarray(rough), jnp.asarray(albedo), jnp.asarray(normal),
        jnp.asarray(view), jnp.asarray(pts), scene,
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect",
        diff_geo=False, speed_first=False, training=False,
        wi_override=tuple(jnp.asarray(w) for w in wis),
    )
    _assert_estimator_parity(ref_ms, our_ms)


def test_pt_render_envmap_estimator_parity(pair):
    """Same estimator chain, constant-2D-envmap light (reference
    path_tracing_render.py:1490-1733): cos/brdf/env2d strategies, texel
    lookup radiance, PBRT 2D CDF light pdf."""
    ref, ours, params, _ = pair
    pts, normal, view, rough, spec, albedo, wis = _surface_setup(pair, seed=24)
    rng = np.random.RandomState(40)
    lgt_map = rng.uniform(0.05, 3.0, (16, 32, 3)).astype(np.float32)
    ptr = import_reference("model.path_tracing_render")

    ref.eval()
    with _patched_ref_samplers(ptr, [_t(w) for w in wis], env2d=True):
        with torch.no_grad():
            ref_out = ptr.pt_render_shadow_indirect_mlp_envmap(
                _t(lgt_map), _t(spec), _t(rough), _t(albedo),
                _t(normal), _t(view), _t(pts), ref,
            )

    from nefii_tpu.ops import path_tracing as our_ptr

    scene = ours.scene_fns(params)
    our_out = our_ptr.pt_render_core(
        jax.random.PRNGKey(0), jnp.asarray(lgt_map), jnp.asarray(spec),
        jnp.asarray(rough), jnp.asarray(albedo), jnp.asarray(normal),
        jnp.asarray(view), jnp.asarray(pts), scene,
        strategies=("cos", "brdf", "env2d"), shadow="indirect",
        diff_geo=False, light_type="constant", speed_first=True,
        training=False,
        wi_override=tuple(jnp.asarray(w) for w in wis),
    )
    _assert_estimator_parity(ref_out, our_out)


# ---------------------------------------------------------------------------
# FULL TRAINING GRADIENT parity: same weights, same rays, same eikonal
# points, same loss -> the gradient of the total training loss w.r.t. every
# parameter must match torch. This pins the training dynamics themselves:
# weight-norm reparametrised grads, the stop-gradient boundaries around the
# tracer, the SampleNetwork IFT path (loss -> differentiable points -> SDF
# params), second-order AD for the eikonal term, and the mask-BCE alpha term
# (reference implicit_differentiable_renderer.py:340-419, model/loss.py).
# ---------------------------------------------------------------------------

class _fixed_uniform:
    """Monkeypatch torch.Tensor.uniform_ to return fixed values for
    shape-matched tensors (the eikonal points and the shared min-SDF step
    vector), leaving other calls untouched."""

    def __init__(self, patterns):
        self.patterns = {tuple(s): v for s, v in patterns}

    def __enter__(self):
        self.saved = torch.Tensor.uniform_
        patterns, saved = self.patterns, torch.Tensor.uniform_

        def fake(t, a=0.0, b=1.0):
            v = patterns.get(tuple(t.shape))
            if v is not None:
                with torch.no_grad():
                    t.copy_(torch.as_tensor(v))
                return t
            return saved(t, a, b)

        torch.Tensor.uniform_ = fake
        return self

    def __exit__(self, *exc):
        torch.Tensor.uniform_ = self.saved
        return False


class _fixed_jax_uniform:
    """Monkeypatch jax.random.uniform to return fixed values for
    shape-matched draws (mirror of _fixed_uniform on the JAX side; the
    fixed values are assumed already scaled to the caller's range)."""

    def __init__(self, patterns):
        self.patterns = {tuple(s): v for s, v in patterns}

    def __enter__(self):
        self.saved = jax.random.uniform
        patterns, saved = self.patterns, jax.random.uniform

        def fake(key, shape=(), dtype=None, minval=0.0, maxval=1.0):
            v = patterns.get(tuple(shape))
            if v is not None:
                return jnp.asarray(v)
            kw = {} if dtype is None else {"dtype": dtype}
            return saved(key, shape, minval=minval, maxval=maxval, **kw)

        jax.random.uniform = fake
        return self

    def __exit__(self, *exc):
        jax.random.uniform = self.saved
        return False


def test_training_gradient_parity(physg_pair):
    from nefii_tpu.models.loss import IDRLoss

    ref, ours, params, _ = physg_pair
    ref_loss_mod = import_reference("model.loss")

    W = 64
    K, pose = _camera(W)
    uv = _center_rays(160, W, seed=12)
    n_rays = uv.shape[1]
    rng = np.random.RandomState(5)
    obj_mask = (rng.rand(1, n_rays) < 0.75)
    gt_rgb = rng.rand(1, n_rays, 3).astype(np.float32)
    n_eik = n_rays // 2
    fixed_eik = rng.uniform(-1.0, 1.0, (n_eik, 3)).astype(np.float32)
    # the min-SDF miss handler draws one shared [n_steps] step vector
    # (reference ray_tracing.py:316, ours _minimal_sdf_points) — pin it to
    # the same values on both sides
    n_steps = ours.ray_tracer.n_steps
    fixed_steps = rng.uniform(0.0, 1.0, (n_steps,)).astype(np.float32)

    loss_kw = dict(
        idr_rgb_weight=1.0, sg_rgb_weight=1.0, eikonal_weight=0.1,
        mask_weight=100.0, alpha=50.0, loss_type="L1",
    )

    # ---- reference: training forward + loss + backward -------------------
    ref.train()
    ref.zero_grad()
    inp = {
        "uv": _t(uv),
        "intrinsics": _t(K[None]),
        "pose": _t(pose[None]),
        "object_mask": torch.as_tensor(obj_mask),
    }
    with _fixed_uniform([((n_eik, 3), fixed_eik), ((n_steps,), fixed_steps)]):
        ref_out = ref(inp)
    ref_loss = ref_loss_mod.IDRLoss(**loss_kw)
    ref_ld = ref_loss(ref_out, {"rgb": _t(gt_rgb)})
    ref_ld["loss"].backward()
    grads_state = {
        n: (p.grad if p.grad is not None else torch.zeros_like(p))
        for n, p in ref.named_parameters()
    }
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    g_ref = checkpoints.import_torch_idr(zeros, grads_state)

    # ---- ours: jax.grad of the same scalar -------------------------------
    our_loss = IDRLoss(**loss_kw)
    batch = {
        "uv": jnp.asarray(uv),
        "intrinsics": jnp.asarray(K[None]),
        "pose": jnp.asarray(pose[None]),
        "object_mask": jnp.asarray(obj_mask),
        "eik_override": jnp.asarray(fixed_eik),
    }
    gt = {"rgb": jnp.asarray(gt_rgb)}

    def scalar(p):
        out = ours.forward(p, batch, jax.random.PRNGKey(0), training=True)
        return our_loss(out, gt, alpha=jnp.float32(50.0))["loss"]

    with _fixed_jax_uniform([((n_steps,), fixed_steps)]):
        val, g_ours = jax.value_and_grad(scalar)(params)

    # loss VALUES agree
    np.testing.assert_allclose(float(val), float(ref_ld["loss"]), rtol=5e-4)

    # gradient trees agree per network (relative L2 per leaf)
    for net in ("implicit_network", "rendering_network", "envmap_material_network"):
        leaves_r, treedef = jax.tree_util.tree_flatten(g_ref[net])
        leaves_o, _ = jax.tree_util.tree_flatten(g_ours[net])
        assert len(leaves_r) == len(leaves_o), net
        for path_r, path_o in zip(leaves_r, leaves_o):
            a, b = np.asarray(path_r, np.float64), np.asarray(path_o, np.float64)
            denom = np.linalg.norm(a) + 1e-8
            rel = np.linalg.norm(a - b) / denom
            assert rel < 2e-3 or np.linalg.norm(a - b) < 1e-7, (
                f"{net}: grad leaf rel err {rel:.2e} (|ref|={denom:.2e})"
            )


def test_pt_estimator_gradient_parity(pair):
    """Gradients of the flagship MC estimator (pt_render_indirect_mlp) match
    torch on injected common samples: d(scalar)/d(light SGs, specular,
    roughness, albedo, normal) AND d/d(implicit+rendering params) through
    the soft-visibility + indirect-radiance chain (reference
    path_tracing_render.py:1255-1487, :2109-2166 detach boundaries:
    pdfs/trace detached, normals detached when diff_geo=False, feature and
    visibility paths attached)."""
    ref, ours, params, _ = pair
    pts, normal, view, rough, spec, albedo, wis = _surface_setup(pair)
    lgt = np.asarray(params["envmap_material_network"]["lgtSGs"], np.float32)
    ptr = import_reference("model.path_tracing_render")
    from nefii_tpu.ops import path_tracing as our_ptr

    # ---- forward once on both sides to find rays whose secondary masks
    # agree for every strategy (trace boundary flips differ by construction)
    ref.eval()
    with _patched_ref_samplers(ptr, [_t(w) for w in wis]):
        with torch.no_grad():
            ref_out0 = ptr.pt_render_indirect_mlp(
                _t(lgt), _t(spec), _t(rough), _t(albedo),
                _t(normal), _t(view), _t(pts), ref,
            )
    scene = ours.scene_fns(params)
    our_out0 = our_ptr.pt_render_core(
        jax.random.PRNGKey(0), jnp.asarray(lgt), jnp.asarray(spec),
        jnp.asarray(rough), jnp.asarray(albedo), jnp.asarray(normal),
        jnp.asarray(view), jnp.asarray(pts), scene,
        strategies=("cos", "brdf", "mix_sg"), shadow="indirect",
        diff_geo=False, speed_first=True, training=False,
        wi_override=tuple(jnp.asarray(w) for w in wis),
    )
    m_ref = _n(ref_out0["secondary_mask"]).astype(bool).reshape(3, -1)
    m_ours = np.asarray(our_out0["secondary_mask"])[..., 0]
    ok = (m_ref == m_ours).all(axis=0)
    assert ok.mean() >= 0.9
    rng = np.random.RandomState(9)
    Wmat = (rng.rand(*np.asarray(our_out0["sg_rgb"]).shape).astype(np.float32)
            * ok[:, None])

    # ---- torch gradients --------------------------------------------------
    leaves_t = {
        "lgt": _t(lgt).requires_grad_(True),
        "spec": _t(spec).requires_grad_(True),
        "rough": _t(rough).requires_grad_(True),
        "albedo": _t(albedo).requires_grad_(True),
        "normal": _t(normal).requires_grad_(True),
    }
    ref.zero_grad()
    with _patched_ref_samplers(ptr, [_t(w) for w in wis]):
        ref_out = ptr.pt_render_indirect_mlp(
            leaves_t["lgt"], leaves_t["spec"], leaves_t["rough"],
            leaves_t["albedo"], leaves_t["normal"], _t(view), _t(pts), ref,
        )
    (ref_out["sg_rgb"] * _t(Wmat)).sum().backward()
    g_leaves_ref = {k: _n(v.grad) for k, v in leaves_t.items()}
    grads_state = {
        n: (p.grad if p.grad is not None else torch.zeros_like(p))
        for n, p in ref.named_parameters()
    }
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    g_net_ref = checkpoints.import_torch_idr(zeros, grads_state)

    # ---- our gradients ----------------------------------------------------
    def scalar(leaves, p):
        sc = ours.scene_fns(p)
        out = our_ptr.pt_render_core(
            jax.random.PRNGKey(0), leaves["lgt"], leaves["spec"],
            leaves["rough"], leaves["albedo"], leaves["normal"],
            jnp.asarray(view), jnp.asarray(pts), sc,
            strategies=("cos", "brdf", "mix_sg"), shadow="indirect",
            diff_geo=False, speed_first=True, training=False,
            wi_override=tuple(jnp.asarray(w) for w in wis),
        )
        return (out["sg_rgb"] * jnp.asarray(Wmat)).sum()

    leaves_j = {k: jnp.asarray(v) for k, v in
                {"lgt": lgt, "spec": spec, "rough": rough,
                 "albedo": albedo, "normal": normal}.items()}
    g_leaves_ours, g_net_ours = jax.grad(scalar, argnums=(0, 1))(leaves_j, params)

    def rel(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-8)

    # measured: every leaf <=3e-5, networks <=8e-5 — gate at 1e-3 for headroom
    for k in g_leaves_ref:
        r = rel(g_leaves_ref[k], g_leaves_ours[k])
        assert r < 1e-3, f"leaf {k}: grad rel err {r:.2e}"

    for net in ("implicit_network", "rendering_network"):
        a = np.concatenate([np.asarray(l, np.float64).ravel()
                            for l in jax.tree_util.tree_leaves(g_net_ref[net])])
        b = np.concatenate([np.asarray(l, np.float64).ravel()
                            for l in jax.tree_util.tree_leaves(g_net_ours[net])])
        r = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-8)
        assert np.linalg.norm(a) > 0, f"{net}: reference grads all zero"
        assert r < 1e-3, f"{net}: grad rel err {r:.2e}"


def test_secondary_distillation_gradient_parity(pair):
    """Gradients of the secondary self-distillation step match torch: the
    reference's train_with_secondary runs forward_with_point (which sets
    state_freeze_geo=True for the call — detaching only NORMALS, leaving
    the feature path attached) and minimises L1(sg_rgb, idr_rgb)
    (idr_train.py:804-852, implicit_differentiable_renderer.py:503-527).
    Injected common samples make the MC estimator deterministic on both
    sides; gradients are compared per network including the implicit net's
    feature-path gradient (the semantics the round-2 advisor flagged)."""
    ref, ours, params, _ = pair
    ptr = import_reference("model.path_tracing_render")

    N_pts, R = 12, 4
    rng = np.random.RandomState(31)
    d = rng.normal(size=(N_pts, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sec_pts = (0.9 * d).astype(np.float32)
    sec_dirs = rng.normal(size=(N_pts, 3)).astype(np.float32)
    sec_dirs /= np.linalg.norm(sec_dirs, axis=-1, keepdims=True)
    pts_nr = np.broadcast_to(sec_pts[:, None], (N_pts, R, 3)).copy()
    dirs_nr = np.broadcast_to(sec_dirs[:, None], (N_pts, R, 3)).copy()

    n_flat = N_pts * R
    # per-strategy injected directions pointing inward-ish so secondary
    # hits exist (view = -dir -> normal side varies; keep them generic)
    wis = []
    for s in range(3):
        w = rng.normal(size=(n_flat, 3)).astype(np.float32)
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
        wis.append(w)

    # ---- torch: training-mode forward_with_point + L1 + backward ---------
    ref.train()
    ref.zero_grad()
    with _patched_ref_samplers(ptr, [_t(w) for w in wis]):
        ref_out = ref.forward_with_point(
            {"points": _t(pts_nr), "ray_dirs": _t(dirs_nr)}
        )
    ref_loss = torch.nn.functional.l1_loss(
        ref_out["sg_rgb_values"], ref_out["idr_rgb_values"]
    )
    ref_loss.backward()
    grads_state = {
        n: (p.grad if p.grad is not None else torch.zeros_like(p))
        for n, p in ref.named_parameters()
    }
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    g_ref = checkpoints.import_torch_idr(zeros, grads_state)

    # ---- ours -------------------------------------------------------------
    batch = {
        "points": jnp.asarray(pts_nr),
        "ray_dirs": jnp.asarray(dirs_nr),
        "wi_override": tuple(jnp.asarray(w) for w in wis),
    }

    def scalar(p):
        out = ours.forward_with_point(
            p, batch, jax.random.PRNGKey(0), freeze_geo=False
        )
        return jnp.abs(out["sg_rgb_values"] - out["idr_rgb_values"]).mean()

    val, g_ours = jax.value_and_grad(scalar)(params)
    np.testing.assert_allclose(float(val), float(ref_loss), rtol=1e-3)

    for net in ("implicit_network", "rendering_network", "envmap_material_network"):
        a = np.concatenate([np.asarray(l, np.float64).ravel()
                            for l in jax.tree_util.tree_leaves(g_ref[net])])
        b = np.concatenate([np.asarray(l, np.float64).ravel()
                            for l in jax.tree_util.tree_leaves(g_ours[net])])
        r = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-12)
        assert np.linalg.norm(a) > 0, f"{net}: reference grads all zero"
        assert r < 1e-2, f"{net}: grad rel err {r:.2e}"
