"""session_memo stale-data guard + eviction API (ADVICE r5 / VERDICT r5
#6): a trained artifact keyed on an input directory must be invalidated
when the files underneath are rewritten, and a multi-tenant driver must
be able to evict explicitly.

Pure unit tests — ``session_memo`` treats the session as an opaque
identity key, so a sentinel object stands in for the SparkSession.
"""

from __future__ import annotations

import os

from storm_netmonitor_spark.io import (
    clear_session_memo,
    session_memo,
    sf_fingerprint,
)


class _Session:  # identity-keyed stand-in
    pass


def _write(d, name, content=b"x"):
    with open(os.path.join(d, name), "wb") as f:
        f.write(content)


def test_memo_without_sf_dir_is_process_sticky(tmp_path):
    s = _Session()
    calls = []
    for _ in range(3):
        session_memo(s, ("k",), lambda: calls.append(1) or len(calls))
    assert calls == [1]


def test_memo_with_sf_dir_invalidates_on_rewrite(tmp_path):
    d = str(tmp_path)
    _write(d, "events.parquet", b"v1")
    s = _Session()
    calls = []

    def build():
        calls.append(1)
        return len(calls)

    assert session_memo(s, ("model",), build, sf_dir=d) == 1
    assert session_memo(s, ("model",), build, sf_dir=d) == 1  # cache hit
    # driver regenerates the file: size changes → fingerprint changes
    _write(d, "events.parquet", b"v2-longer")
    assert session_memo(s, ("model",), build, sf_dir=d) == 2
    # a DIFFERENT session never shares entries
    assert session_memo(_Session(), ("model",), build, sf_dir=d) == 3


def test_fingerprint_covers_only_parquet_files(tmp_path):
    d = str(tmp_path)
    _write(d, "a.parquet")
    _write(d, "notes.txt")
    root, entries = sf_fingerprint(d)
    assert root == os.path.abspath(d)
    assert [e[0] for e in entries] == ["a.parquet"]
    # non-directory input degrades to a path-only fingerprint, no raise
    assert sf_fingerprint(os.path.join(d, "missing"))[1] == ()


def test_clear_session_memo_scopes_to_session():
    s1, s2 = _Session(), _Session()
    session_memo(s1, ("a",), lambda: 1)
    session_memo(s2, ("b",), lambda: 2)
    assert clear_session_memo(s1) >= 1
    # s2's entry survived; rebuilding s1's entry runs the builder again
    calls = []
    session_memo(s2, ("b",), lambda: calls.append(1) or 99)
    assert calls == []
    session_memo(s1, ("a",), lambda: calls.append(1) or 99)
    assert calls == [1]
    clear_session_memo(s2)
