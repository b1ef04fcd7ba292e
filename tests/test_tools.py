"""Dataset/tree renaming tools (counterparts of the reference's
rename_folders.py / rename_tre.py)."""

import json
import os

from pipnet_tpu.tools import (main, normalize_name, rename_folders,
                              rename_tree_leaves)


def test_normalize_name():
    assert normalize_name("Parus major", 0) == "ina_001_Parus_Major"
    assert normalize_name("parus_major!", 11, "cub") == "cub_012_Parus_Major"


def test_rename_folders_roundtrip(tmp_path):
    for d in ("Parus major", "Corvus corax", "ina_003_Already_Done"):
        (tmp_path / d).mkdir()
    mapping = rename_folders(str(tmp_path))
    assert mapping["Corvus corax"] == "ina_001_Corvus_Corax"
    assert mapping["Parus major"] == "ina_002_Parus_Major"
    assert mapping["ina_003_Already_Done"] == "ina_003_Already_Done"
    assert (tmp_path / "ina_002_Parus_Major").is_dir()
    saved = json.loads((tmp_path / "rename_mapping.json").read_text())
    assert saved == mapping
    # idempotent second run
    again = rename_folders(str(tmp_path))
    assert set(again.keys()) == set(again.values())


def test_rename_tree_leaves(tmp_path):
    src = tmp_path / "t.tre"
    src.write_text("((Parus_major:1,Corvus_corax:1):1,Pica_pica:2);\n")
    out = tmp_path / "out.tre"
    mapping = rename_tree_leaves(str(src), str(out))
    text = out.read_text()
    for new in mapping.values():
        assert new in text
    assert "Parus_major:" not in text


def test_cli(tmp_path):
    (tmp_path / "Some bird").mkdir()
    rc = main(["rename-folders", str(tmp_path), "--dry_run"])
    assert rc == 0
    assert (tmp_path / "Some bird").is_dir()     # dry run: untouched
