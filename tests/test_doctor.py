"""tools/doctor.py smoke: all checks pass on the CPU test environment."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.slow  # builds a tiny snapshot (~30 s); the FAIL-path test stays in the smoke tier
def test_doctor_green_on_snapshot(tmp_path, capsys, monkeypatch):
    from make_tiny_snapshot import make_snapshot

    snap = str(tmp_path / "snap")
    make_snapshot(snap)

    import doctor

    monkeypatch.setattr(sys, "argv", ["doctor.py", "--model_dir", snap])
    with pytest.raises(SystemExit) as e:
        doctor.main()
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "[OK  ] jax backend" in out
    assert "[OK  ] snapshot layout" in out
    assert "[FAIL]" not in out


def test_doctor_fails_on_bad_layout(tmp_path, capsys, monkeypatch):
    import doctor

    bad = tmp_path / "not_a_snapshot"
    bad.mkdir()
    monkeypatch.setattr(sys, "argv", ["doctor.py", "--model_dir", str(bad)])
    with pytest.raises(SystemExit) as e:
        doctor.main()
    assert e.value.code == 1
    assert "[FAIL] snapshot layout" in capsys.readouterr().out
