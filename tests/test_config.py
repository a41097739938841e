"""HOCON parser tests — must parse the exact reference conf schema."""

import os

import pytest

from nefii_tpu.config import ConfigFactory, parse_string

import pytest

pytestmark = pytest.mark.fast  # sub-minute math/unit tests

REFERENCE_CONF = "/root/reference/code/confs_sg/conf.conf"

SAMPLE = """
train{
    expname = default
    dataset_class = datasets.scene_dataset.SceneDataset
    num_pixels = 2048            # iterations
    idr_learning_rate = 5e-4
    alpha_milestones = [250000,500000,750000]  # iterations
}
model{
    render_type = pt_render_indirect_mlp
    fast_multi_ray = False
    implicit_network
    {
        d_in = 3
        dims = [ 512, 512 ]
        geometric_init = True
        bias = 0.6
        skip_in = [4]
    }
    ray_tracer
    {
        sdf_threshold = 5.0e-5
    }
}
"""


def test_parse_sample():
    conf = parse_string(SAMPLE)
    assert conf.get_string("train.expname") == "default"
    assert conf.get_string("train.dataset_class") == "datasets.scene_dataset.SceneDataset"
    assert conf.get_int("train.num_pixels") == 2048
    assert conf.get_float("train.idr_learning_rate") == 5e-4
    assert conf.get_list("train.alpha_milestones") == [250000, 500000, 750000]
    assert conf.get_bool("model.fast_multi_ray") is False
    model = conf.get_config("model")
    implicit = model.get_config("implicit_network")
    assert implicit.get_bool("geometric_init") is True
    assert implicit.get_float("bias") == 0.6
    assert implicit.get_list("dims") == [512, 512]
    assert implicit.get_list("skip_in") == [4]
    assert conf.get_float("model.ray_tracer.sdf_threshold") == 5.0e-5


def test_defaults_and_missing():
    conf = parse_string(SAMPLE)
    assert conf.get_string("model.render_type", default="sg") == "pt_render_indirect_mlp"
    assert conf.get_string("model.nonexistent", default="sg") == "sg"
    with pytest.raises(KeyError):
        conf.get_string("model.nonexistent")


@pytest.mark.skipif(not os.path.exists(REFERENCE_CONF), reason="reference not mounted")
def test_parse_reference_conf():
    conf = ConfigFactory.parse_file(REFERENCE_CONF)
    assert conf.get_int("train.num_pixels") == 2048
    assert conf.get_int("train.num_rays") == 64
    assert conf.get_float("loss.mask_weight") == 100.0
    assert conf.get_string("model.render_type") == "pt_render_indirect_mlp"
    assert conf.get_int("model.feature_vector_size") == 512
    imp = conf.get_config("model.implicit_network")
    assert imp.get_list("dims") == [512] * 8
    assert imp.get_bool("use_last_as_f") is True
    assert conf.get_int("model.ray_tracer.n_rootfind_steps") == 32
    env = conf.get_config("model.envmap_material_network")
    assert env.get_int("num_lgt_sgs") == 128
    assert env.get_list("specular_albedo") == [0.5, 0.5, 0.5]
    rn = conf.get_config("model.rendering_network")
    assert rn.get_string("clip_method") == "pow2"


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/code/confs_sg"), reason="reference not mounted"
)
def test_parse_all_reference_confs():
    import glob

    for path in glob.glob("/root/reference/code/confs_sg/*.conf"):
        conf = ConfigFactory.parse_file(path)
        assert conf.get_config("model") is not None


def test_shipped_confs_build_models_with_perf_knobs():
    """The shipped confs must construct IDRNetwork with the TPU perf knobs
    wired: fused SDF kernel on, and the A/B-validated reduced secondary
    tracer (trace iters 5, line search off) inheriting un-overridden fields
    from the primary tracer."""
    import glob

    from nefii_tpu.models.idr import IDRNetwork

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in (os.path.join(repo, "confs", "conf.conf"),
                 os.path.join(repo, "confs", "conf_neus.conf")):
        conf = ConfigFactory.parse_file(path)
        model = IDRNetwork.from_conf(conf.get_config("model"))
        assert model.use_fused_sdf
        sec = model.secondary_ray_tracer
        assert sec is not None
        assert sec.sphere_tracing_iters == 5
        assert sec.line_step_iters == 0
        assert sec.n_steps == 50
        # inherited from the primary tracer block
        assert sec.sdf_chunk == model.ray_tracer.sdf_chunk
        assert sec.sdf_threshold == model.ray_tracer.sdf_threshold
