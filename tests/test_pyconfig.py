"""Python-file config subsystem tests (utils/pyconfig.py)."""
import textwrap

from meta_interpolation_tpu.config import Config
from meta_interpolation_tpu.utils.pyconfig import (AttrDict, load_pyconfig,
                                                   merge_into_config)


def test_load_and_merge(tmp_path):
    cfg_file = tmp_path / "voxelflow_maml_config.py"
    cfg_file.write_text(textwrap.dedent("""
        MODEL = "voxelflow"
        LOSS = "1*MSE"
        BATCH_SIZE = 4
        INNER_LR = 2e-5
        SOME_UNKNOWN_SETTING = 42
    """))
    pycfg = load_pyconfig(str(cfg_file))
    assert pycfg.model == "voxelflow"
    assert pycfg["batch_size"] == 4

    cfg = merge_into_config(Config(), pycfg)
    assert cfg.model == "voxelflow"
    assert cfg.loss == "1*MSE"
    assert cfg.batch_size == 4
    assert cfg.inner_lr == 2e-5
    # unknown keys ignored, defaults preserved
    assert cfg.outer_lr == Config().outer_lr


def test_attrdict():
    d = AttrDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    try:
        _ = d.missing
        assert False
    except AttributeError:
        pass
