"""Driver-window rotation bookkeeping (queries._last_checked_round):
only a clean pass may rotate a query to the back of the stalest-first
order — an errored or mismatched entry must keep the query at the front
so the driver re-checks it next round."""

from __future__ import annotations

import json

from watchman_spark.queries import _last_checked_round


def _write(tmp_path, rnd, data):
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(data))


def test_only_passing_entries_credit_a_round(tmp_path):
    _write(tmp_path, 1, {
        "ok_q": {"rows_match": True, "schema_match": True, "hash_match": True,
                 "err": None},
        "bad_hash_q": {"rows_match": True, "schema_match": True,
                       "hash_match": False, "err": None},
        "err_q": {"rows_match": False, "schema_match": False,
                  "hash_match": False, "err": "boom"},
        "rows_only_q": {"rows_match": True, "err": None},
    })
    last = _last_checked_round(repo_dir=str(tmp_path))
    assert last.get("ok_q") == 1
    assert "bad_hash_q" not in last   # mismatched: stays stalest (priority 0)
    assert "err_q" not in last        # errored: stays stalest
    assert last.get("rows_only_q") == 1  # rows-only record, no error: checked


def test_later_pass_supersedes_earlier_failure(tmp_path):
    _write(tmp_path, 1, {"q": {"rows_match": True, "schema_match": True,
                               "hash_match": False, "err": None}})
    _write(tmp_path, 2, {"q": {"rows_match": True, "schema_match": True,
                               "hash_match": True, "err": None}})
    assert _last_checked_round(repo_dir=str(tmp_path)).get("q") == 2


def test_failure_after_pass_does_not_advance(tmp_path):
    _write(tmp_path, 1, {"q": {"rows_match": True, "schema_match": True,
                               "hash_match": True, "err": None}})
    _write(tmp_path, 2, {"q": {"rows_match": False, "schema_match": True,
                               "hash_match": False, "err": None}})
    # last CLEAN pass is round 1; the round-2 failure must not push q back
    assert _last_checked_round(repo_dir=str(tmp_path)).get("q") == 1
