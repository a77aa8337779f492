"""bench.py prior-round read self-check (VERDICT r4 weak #5): the
driver wraps the bench line in a {"parsed": {...}} envelope, and for
three rounds a missed unwrap made vs_baseline print 1.0 regardless of
the data.  read_prior now warns loudly whenever a prior file exists
but no value parses, so that class of artifact bug cannot hide."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from bench import read_prior  # noqa: E402


def test_no_prior_files_is_silent(tmp_path):
    last, warning = read_prior(str(tmp_path))
    assert last == {} and warning is None


def test_driver_envelope_unwraps(tmp_path):
    rec = {"metric": "m", "value": 986.32, "unit": "Mrays/s"}
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"n": 1, "tail": "...", "parsed": rec})
    )
    last, warning = read_prior(str(tmp_path))
    assert last["value"] == 986.32 and warning is None


def test_bare_record_reads(tmp_path):
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"metric": "m", "value": 42.0})
    )
    last, warning = read_prior(str(tmp_path))
    assert last["value"] == 42.0 and warning is None


@pytest.mark.parametrize("content", [
    json.dumps({"n": 1, "tail": "no parsed key"}),   # envelope w/o data
    json.dumps({"parsed": {"metric": "m"}}),         # parsed w/o value
    "{not json",                                     # corrupt file
])
def test_unparseable_prior_warns(tmp_path, content):
    (tmp_path / "BENCH_r03.json").write_text(content)
    last, warning = read_prior(str(tmp_path))
    assert last == {}
    assert warning is not None and "BENCH_r03.json" in warning


def test_newest_round_wins(tmp_path):
    for n, v in [(1, 10.0), (2, 20.0)]:
        (tmp_path / f"BENCH_r0{n}.json").write_text(
            json.dumps({"parsed": {"value": v}})
        )
    last, _ = read_prior(str(tmp_path))
    assert last["value"] == 20.0
