"""CLI option-parsing matrix + config-open retry parity — the rebuild
analog of the reference's test/test_option_parsing.py:12-104 (mutually
exclusive modes, required companions, config presence) and the
retry-on-IOError config open (ref: pypdfocr/pypdfocr.py:61-64).

All argparse failures exit BEFORE a SparkSession is built, so these tests
need no Spark.
"""

import builtins

import pytest

from pypdfocr_spark import cli
from pypdfocr_spark.config import DEFAULT_ROUTE, DEFAULT_TARGETS


# ----------------------------------------------------------- option matrix
def test_batch_and_watch_conflict():
    # like ref test_standalone_watch_conflict: input + watch are exclusive
    with pytest.raises(SystemExit):
        cli.main(["--sf-dir", "/x", "--watch", "/y", "--checkpoint", "/c", "--out", "/o"])


def test_neither_mode_given():
    with pytest.raises(SystemExit):
        cli.main(["--out", "/o"])


def test_watch_requires_checkpoint():
    with pytest.raises(SystemExit):
        cli.main(["--watch", "/y", "--out", "/o"])


def test_out_required():
    with pytest.raises(SystemExit):
        cli.main(["--sf-dir", "/x"])


def test_corpus_counts_as_input_mode():
    # --corpus alongside --watch is still a conflict
    with pytest.raises(SystemExit):
        cli.main(["--corpus", "/x", "--watch", "/y", "--checkpoint", "/c", "--out", "/o"])


# ------------------------------------------------------------ config loading
def test_load_config_defaults():
    cfg = cli.load_config(None)
    assert cfg.targets == list(DEFAULT_TARGETS)
    assert cfg.default_route == DEFAULT_ROUTE


def test_load_config_yaml_order_preserved(tmp_path):
    # first-match routing depends on mapping order (ref: pypdfocr.py:301-307)
    p = tmp_path / "c.yaml"
    p.write_text(
        "folders:\n  zfolder: [alpha]\n  afolder: [beta, GAMMA]\n"
        "default_folder: misc\nmatch_using_filename: false\n"
    )
    cfg = cli.load_config(str(p))
    assert [t[0] for t in cfg.targets] == ["zfolder", "afolder"]
    # keywords lowercased like the reference (ref: pypdfocr.py:305-307)
    assert cfg.targets[1][1] == ["beta", "gamma"]
    assert cfg.default_route == "misc"
    assert cfg.use_filename is False


def test_config_open_retries_then_succeeds(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text("folders: {docs: [word]}\n")
    real_open = builtins.open
    calls = {"n": 0}

    def flaky_open(path, *a, **kw):
        if str(path) == str(p) and calls["n"] < 3:
            calls["n"] += 1
            raise OSError("transient mount hiccup")
        return real_open(path, *a, **kw)

    monkeypatch.setattr(builtins, "open", flaky_open)
    cfg = cli.load_config(str(p))
    assert calls["n"] == 3  # failed 3 times, then read fine
    assert [t[0] for t in cfg.targets] == ["docs"]


def test_config_open_gives_up_after_six(tmp_path, monkeypatch):
    p = tmp_path / "c.yaml"
    p.write_text("x: 1\n")
    calls = {"n": 0}

    def always_fail(path, *a, **kw):
        calls["n"] += 1
        raise OSError("gone")

    monkeypatch.setattr(builtins, "open", always_fail)
    with pytest.raises(OSError):
        cli._read_with_retry(str(p))
    assert calls["n"] == 6  # exactly the reference's retry budget


def test_load_config_preprocess_and_scratch(tmp_path):
    from pypdfocr_spark.cli import load_config

    # CLI flags with no config file
    cfg = load_config(None, preprocess=True, scratch_dir="/mnt/shared")
    assert cfg.preprocess and cfg.scratch_dir == "/mnt/shared"
    # file keys picked up; CLI flags override
    p = tmp_path / "c.yaml"
    p.write_text("preprocess: true\nscratch_dir: /mnt/file\n")
    cfg = load_config(str(p))
    assert cfg.preprocess and cfg.scratch_dir == "/mnt/file"
    cfg = load_config(str(p), scratch_dir="/mnt/cli")
    assert cfg.scratch_dir == "/mnt/cli"
    # defaults stay off
    cfg = load_config(None)
    assert not cfg.preprocess and cfg.scratch_dir is None
