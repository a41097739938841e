"""End-to-end two-stage workflow validation at 128^2 (VERDICT r5 #6).

Drives the COMPLETE shipped pipeline — the same command surfaces a user
runs (reference training_scripts/robot/{run_s1,run_s2,render,eval}.sh) —
on the scene-v2 synthetic blobby (synthetic_scene.py: 2-lobe SG-mixture
light inside the model family's own light parameterization, MC penumbras,
one-bounce interreflection, SG-radiance background):

  1. scene     — N_VIEWS views at RES^2 written in the SceneDataset on-disk
                 layout (image/*.exr + mask/*.png + cam_dict_norm.json),
                 split into train/test dirs, plus GT diffuse-albedo EXRs so
                 evaluate.py scores the decomposition, not just the rgb.
  2. mesh      — the analytic blobby marched to a .obj via the shipped
                 two-stage extractor (utils/plots.get_surface_high_res_mesh).
  3. Step 1    — training.geometry_runner: SDF distillation from the mesh
                 through the native C++ BVH sampler (confs/sdf.conf, the
                 shipped conf — reference robot/run_s1.sh).
  4. Step 2    — training.exp_runner --freeze_geometry --geometry <s1 ckpt>
                 with the FLAGSHIP confs/conf.conf model (8x512 SDF,
                 128-SG light, pt_render_indirect_mlp, fused bf16 trace,
                 secondary self-distillation every 10 iters, roughness
                 warmup — reference robot/run_s2.sh), train cadence scaled
                 to this validation's iteration budget.
  5. render    — scripts.render with 64-ray AA and the default
                 --auto_budget demand-probe compaction sizing.
  6. evaluate  — scripts.evaluate (masked tonemapped PSNR/SSIM/MS-SSIM +
                 raw-albedo alignment rows), writing results.txt.

Each stage is idempotent (skipped when its output exists), so a killed run
resumes. The committed results live in e2e_workflow_results.json; the
README "End-to-end validation" table cites them.

Usage: python e2e_workflow.py [workdir] [out.json] [res] [views] [s2_iters]
"""

import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _HERE)
sys.path.insert(0, ROOT)

WORK = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nefii_e2e_128"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    _HERE, "e2e_workflow_results.json")
RES = int(sys.argv[3]) if len(sys.argv) > 3 else 128
N_VIEWS = int(sys.argv[4]) if len(sys.argv) > 4 else 16   # last 2 held out
S2_ITERS = int(sys.argv[5]) if len(sys.argv) > 5 else 15000
S1_ITERS = int(sys.argv[6]) if len(sys.argv) > 6 else 3000
N_TEST = 2

import jax  # noqa: E402

from nefii_tpu.utils import compile_cache  # noqa: E402

compile_cache.setup(jax)

from nefii_tpu.utils import exr as exr_io  # noqa: E402
from synthetic_scene import ALBEDOS, render_gt_sg, sdf_np  # noqa: E402

H = W = RES
TRAIN_DIR = os.path.join(WORK, "scene_train")
TEST_DIR = os.path.join(WORK, "scene_test")
EXPS = os.path.join(WORK, "exps")
MESH = os.path.join(WORK, "blobby.obj")
RENDERS = os.path.join(WORK, "renders")
timings = {}


def _stage(name, fn):
    """Run `fn` once: a .done marker is written only on completion, so a
    killed run resumes at the interrupted stage (a half-trained Step 2 is
    re-run, not rendered)."""
    marker = os.path.join(WORK, f"{name}.done")
    if os.path.exists(marker):
        print(f"[e2e] {name}: already done", flush=True)
        timings[name] = json.load(open(marker)).get("s")
        return
    t0 = time.time()
    fn()
    timings[name] = round(time.time() - t0, 1)
    with open(marker, "w") as fm:
        json.dump({"s": timings[name]}, fm)
    print(f"[e2e] {name}: {timings[name]}s", flush=True)


# ---------------------------------------------------------------------------
def make_scene():
    import imageio.v2 as imageio

    f = W * 1.1
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = f
    K[0, 2], K[1, 2] = W / 2, H / 2
    for d in (TRAIN_DIR, TEST_DIR):
        os.makedirs(os.path.join(d, "image"), exist_ok=True)
        os.makedirs(os.path.join(d, "mask"), exist_ok=True)
        os.makedirs(os.path.join(d, "diffuse"), exist_ok=True)
    cams = {TRAIN_DIR: {}, TEST_DIR: {}}
    counters = {TRAIN_DIR: 0, TEST_DIR: 0}
    for i in range(N_VIEWS):
        # the same camera ring make_views_sg uses (synthetic_scene.py)
        ang = 2 * np.pi * i / N_VIEWS
        el = 0.35 * np.sin(1.7 * i)
        eye = 2.0 * np.array([np.sin(ang) * np.cos(el), np.sin(el),
                              -np.cos(ang) * np.cos(el)])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        C2W = np.eye(4, dtype=np.float32)
        C2W[:3, 0], C2W[:3, 1], C2W[:3, 2], C2W[:3, 3] = right, up, fwd, eye
        img, mask, aux = render_gt_sg(C2W, K, H, W, seed=i)
        d = TEST_DIR if i >= N_VIEWS - N_TEST else TRAIN_DIR
        j = counters[d]
        counters[d] += 1
        exr_io.write(os.path.join(d, "image", f"{j:03d}.exr"), img)
        imageio.imwrite(os.path.join(d, "mask", f"{j:03d}.png"),
                        (mask * 255).astype(np.uint8))
        exr_io.write(os.path.join(d, "diffuse", f"{j:03d}.exr"),
                     aux["albedo"])
        cams[d][f"{j:03d}.exr"] = {
            "K": K.reshape(-1).tolist(),
            "W2C": np.linalg.inv(C2W).reshape(-1).tolist(),
        }
        print(f"[e2e] view {i + 1}/{N_VIEWS}", flush=True)
    for d in (TRAIN_DIR, TEST_DIR):
        with open(os.path.join(d, "cam_dict_norm.json"), "w") as fjson:
            json.dump(cams[d], fjson)


def make_mesh():
    from nefii_tpu.utils.mesh_io import save_mesh
    from nefii_tpu.utils.plots import get_surface_high_res_mesh

    verts, faces = get_surface_high_res_mesh(
        lambda p: sdf_np(np.asarray(p, np.float32))[0], resolution=160)
    assert len(faces) > 1000, "degenerate blobby mesh"
    save_mesh(MESH, verts, faces)
    print(f"[e2e] mesh: {len(verts)} verts / {len(faces)} faces", flush=True)


def run_s1():
    from nefii_tpu.training.geometry_runner import main as s1_main

    s1_main([
        "--conf", os.path.join(ROOT, "confs", "sdf.conf"),
        "--mesh_path", MESH, "--not_scale_to_unit",
        "--data_split_dir", TRAIN_DIR, "--gamma", "1.0",
        "--exps_folder_name", EXPS, "--expname", "e2e_s1",
        "--batch_size", "8192", "--max_niter", str(S1_ITERS),
    ])


def _latest(expdir):
    return sorted(os.listdir(expdir))[-1]


def _s2_conf():
    """The shipped flagship conf with the train cadence scaled to this
    validation's budget (the model/loss/tracer sections are byte-identical
    to confs/conf.conf — each substitution asserts it matched exactly
    once, so conf drift fails loudly instead of silently diverging)."""
    txt = open(os.path.join(ROOT, "confs", "conf.conf")).read()
    m1, m2 = int(S2_ITERS * 0.45), int(S2_ITERS * 0.8)
    subs = [
        ("num_pixels = 2048", "num_pixels = 512"),
        ("num_rays = 64", "num_rays = 8"),
        ("plot_freq = 1000", "plot_freq = -1"),
        ("val_freq = 1000", "val_freq = -1"),
        ("ckpt_freq = 1000", "ckpt_freq = 2500"),
        ("alpha_milestones = [250000,500000,750000,1000000,1250000]",
         f"alpha_milestones = [{m1},{m2}]"),
        ("idr_sched_milestones = [250000,500000,750000,1000000,1250000]",
         f"idr_sched_milestones = [{m1},{m2}]"),
        ("sg_sched_milestones = [250000,500000,750000,1000000,1250000]",
         f"sg_sched_milestones = [{m1},{m2}]"),
    ]
    for old, new in subs:
        assert txt.count(old) == 1, f"conf drift: {old!r} x{txt.count(old)}"
        txt = txt.replace(old, new)
    path = os.path.join(WORK, "e2e_s2.conf")
    with open(path, "w") as fconf:
        fconf.write(txt)
    return path


def run_s2():
    from nefii_tpu.training.exp_runner import main as s2_main

    s1_ck = os.path.join(EXPS, "e2e_s1")
    s1_ck = os.path.join(s1_ck, _latest(s1_ck), "checkpoints")
    s2_main([
        "--conf", _s2_conf(),
        "--data_split_dir", TRAIN_DIR, "--data_split_dir_test", TEST_DIR,
        "--gamma", "1.0", "--exps_folder_name", EXPS, "--expname", "e2e_s2",
        "--freeze_geometry", "--geometry", s1_ck,
        "--roughness_warmup", "2000", "--secondary_train_interval", "10",
        "--secondary_batch_size", "256",
        "--nepoch", "1000000", "--max_niter", str(S2_ITERS),
        "--memory_capacity_level", "15",
    ])


def run_render():
    from nefii_tpu.scripts.render import main as render_main

    expdir = os.path.join(EXPS, "e2e_s2")
    render_main([
        "--conf", os.path.join(WORK, "e2e_s2.conf"),
        "--data_split_dir", TEST_DIR, "--gamma", "1.0",
        "--old_expdir", expdir, "--timestamp", _latest(expdir),
        "--num_rays", "64", "--memory_capacity_level", "17",
        "--out_dir", RENDERS,
    ])


def run_eval():
    from nefii_tpu.scripts.evaluate import main as eval_main

    result = eval_main(RENDERS, TEST_DIR,
                       out_path=os.path.join(WORK, "results.txt"))
    summary = {
        "res": RES, "train_views": N_VIEWS - N_TEST, "test_views": N_TEST,
        "s1_iters": S1_ITERS, "s2_iters": S2_ITERS,
        "scene": "v2-sg (2-lobe SG light, MC penumbras, one-bounce indirect)",
        "timings_s": timings,
    }
    for split, metrics in result.items():
        summary[split] = {
            m: round(float(np.mean(v)), 4)
            for m, v in metrics.items()
            if len(v) and np.isfinite(np.mean(v))
        }
    with open(OUT, "w") as fjson:
        json.dump(summary, fjson, indent=1)
    print(json.dumps(summary, indent=1))


def main():
    os.makedirs(WORK, exist_ok=True)
    _stage("scene", make_scene)
    _stage("mesh", make_mesh)
    _stage("step1", run_s1)
    _stage("step2", run_s2)
    _stage("render", run_render)
    run_eval()


if __name__ == "__main__":
    main()
