"""Tests for the gin-compatible config system."""

import enum
import os
import textwrap

import pytest

from genrec_tpu.configlib import gin
from genrec_tpu.configlib.cli import parse_config


def test_basic_bindings():
    @gin.configurable
    def train_fn(epochs=1, lr=0.1, name="x"):
        return epochs, lr, name

    gin.parse_config(textwrap.dedent("""
        train_fn.epochs = 100
        train_fn.lr = 1e-4
        train_fn.name = "beauty"
    """))
    assert train_fn() == (100, 1e-4, "beauty")
    # explicit kwargs win over bindings
    assert train_fn(epochs=2) == (2, 1e-4, "beauty")


def test_lists_and_nested_values():
    @gin.configurable
    def f(dims=None, table=None):
        return dims, table

    gin.parse_config("f.dims = [512, 256, 128, 64]\n"
                     "f.table = {'a': [1, 2], 'b': (3, 4)}")
    dims, table = f()
    assert dims == [512, 256, 128, 64]
    assert table == {"a": [1, 2], "b": (3, 4)}


def test_multiline_list():
    @gin.configurable
    def g(dims=None):
        return dims

    gin.parse_config("g.dims = [512,\n  256,\n  128]\n")
    assert g() == [512, 256, 128]


def test_macros_and_refs():
    @gin.configurable
    def dataset(split="all", path=""):
        return ("dataset", split, path)

    @gin.configurable
    def runner(ds=None):
        return ds

    gin.parse_config(textwrap.dedent("""
        MODEL_HUB = "sentence-transformers/sentence-t5-xl"
        dataset.split = "beauty"
        dataset.path = %MODEL_HUB
        runner.ds = @dataset
    """))
    ds_fn = runner()
    assert callable(ds_fn)
    assert ds_fn() == ("dataset", "beauty",
                       "sentence-transformers/sentence-t5-xl")


def test_called_ref():
    @gin.configurable
    def leaf(v=1):
        return v * 2

    @gin.configurable
    def root(x=None):
        return x

    gin.parse_config("leaf.v = 21\nroot.x = @leaf()")
    assert root() == 42


def test_enum_constants_with_reference_style_path():
    @gin.constants_from_enum
    class TestOnlyForwardMode(enum.Enum):
        GUMBEL_SOFTMAX = 1
        STE = 2

    @gin.configurable
    def cfg(mode=None):
        return mode

    # reference configs use the torch package path; suffix matching resolves it
    gin.parse_config(
        "cfg.mode = %genrec.models.rqvae_somewhere.TestOnlyForwardMode.STE")
    assert cfg() is TestOnlyForwardMode.STE


def test_scoped_name_uses_last_component():
    @gin.configurable
    def train(epochs=1):
        return epochs

    gin.parse_config("some.module.train.epochs = 7")
    assert train() == 7


def test_class_configurable():
    @gin.configurable
    class Model:
        def __init__(self, dim=8, depth=2):
            self.dim, self.depth = dim, depth

    gin.parse_config("Model.dim = 64")
    m = Model()
    assert (m.dim, m.depth) == (64, 2)
    m2 = Model(dim=3)
    assert m2.dim == 3


def test_comments_and_blank_lines():
    @gin.configurable
    def h(a=0):
        return a

    gin.parse_config("# a comment\n\nh.a = 5  # trailing\n")
    assert h() == 5


def test_string_with_hash_not_treated_as_comment():
    @gin.configurable
    def h2(s=""):
        return s

    gin.parse_config('h2.s = "value # not comment"')
    assert h2() == "value # not comment"


def test_query_and_bind_parameter():
    gin.parse_config("train.epochs = 3")
    assert gin.query_parameter("train.epochs") == 3
    gin.bind_parameter("train.epochs", 9)
    assert gin.query_parameter("train.epochs") == 9
    assert gin.query_parameter("train.missing", default=None) is None
    with pytest.raises(gin.GinError):
        gin.query_parameter("train.missing")


def test_include(tmp_path):
    base = tmp_path / "base.gin"
    base.write_text('HUB = "hub-path"\n')
    main = tmp_path / "main.gin"
    main.write_text(f'include "{base}"\nuses.hub = %HUB\n')

    @gin.configurable
    def uses(hub=""):
        return hub

    gin.parse_config_file(str(main))
    assert uses() == "hub-path"


def test_import_rewrite_tolerates_missing_modules():
    # 'import genrec.data.amazon' is rewritten to genrec_tpu.data.amazon;
    # unknown modules must not crash parsing.
    gin.parse_config("import genrec.no_such_module\nx.y = 1")
    assert gin.query_parameter("x.y") == 1


def test_cli_split_substitution(tmp_path):
    cfg = tmp_path / "t.gin"
    cfg.write_text('train.split = "{split}"\ntrain.epochs = 2\n')

    args = parse_config([str(cfg), "--split", "sports",
                         "--gin", "train.epochs=5"])
    assert args.split == "sports"
    assert gin.query_parameter("train.split") == "sports"
    assert gin.query_parameter("train.epochs") == 5


def test_required():
    @gin.configurable
    def need(x=gin.REQUIRED):
        return x

    with pytest.raises(gin.GinError):
        need()
    gin.parse_config("need.x = 1")
    assert need() == 1


def test_reference_config_files_parse():
    """Every reference .gin file must parse with our system (after {split} sub)."""
    ref_cfg = "/root/reference/config"
    if not os.path.isdir(ref_cfg):
        pytest.skip("reference configs not mounted")
    count = 0
    for dirpath, _, files in os.walk(ref_cfg):
        for fname in files:
            if not fname.endswith(".gin"):
                continue
            with open(os.path.join(dirpath, fname)) as f:
                text = f.read().replace("{split}", "beauty")
            gin.parse_config(text, base_dir=dirpath)
            gin.clear_config()
            count += 1
    assert count >= 8
