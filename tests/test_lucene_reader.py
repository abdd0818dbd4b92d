"""Reading a REAL Lucene 9.5.0 index commit — the reference's golden
fixture (``core/tests/rfc-database``), mirroring its test
``core/tests/rfc_database.rs:7-103`` assertion-for-assertion.

The fixture checkout holds real bytes only for ``segments_1`` (the
``.si``/``.cfs`` files are git-lfs pointer stubs), so the split is:

- every assertion whose data lives in ``segments_N`` runs against the
  REAL golden bytes (with CRC-32 footer verification);
- every assertion whose data lives in ``.si`` (max_doc, diagnostics,
  files, attributes) runs against a write→read round-trip of the
  values the reference's test documents, through the same
  ``read_segment_index`` entry point.
"""

from __future__ import annotations

import os
import shutil

import pytest

from lucene_rust_spark.index.lucene_reader import (
    CorruptIndexError,
    SegmentCommitInfo,
    SegmentIndex,
    SegmentInfo,
    SortFieldSpec,
    check_footer,
    find_latest_commit,
    generation_to_string,
    read_segment_index,
    read_segment_info,
    write_segment_index,
    write_segment_info,
)

FIXTURE = "/root/reference/core/tests/rfc-database"

# identities recorded in the real segments_1 (rfc_database.rs:24-28)
COMMIT_ID = "0e4f01f9665661c1754333c97632152e"
SCI_IDS = {
    "_0": "0e4f01f9665661c1754333c976321509",
    "_b": "0e4f01f9665661c1754333c97632152a",
    "_c": "0e4f01f9665661c1754333c97632152d",
}
# .si payloads documented by rfc_database.rs:49-103 (the files themselves
# are lfs stubs in this checkout)
MAX_DOCS = {"_0": 701, "_b": 572, "_c": 7885}
TIMESTAMPS = {"_0": "1676593179395", "_b": "1676593196078", "_c": "1676593196110"}
FILES = {
    "_0": {"_0.cfe", "_0.si", "_0.cfs"},
    "_b": {"_b.cfe", "_b.si", "_b.cfs"},
    "_c": {
        "_c.fdm", "_c.si", "_c.fdt", "_c_Lucene90_0.tip", "_c_Lucene90_0.pos",
        "_c.nvd", "_c.fdx", "_c_Lucene90_0.doc", "_c_Lucene90_0.tim",
        "_c_Lucene90_0.tmd", "_c.nvm", "_c.fnm",
    },
}


def test_golden_segments_file():
    """rfc_database.rs assertions resident in the real segments_1."""
    si = read_segment_index(FIXTURE, load_si=False)
    assert si.version == 28
    assert si.generation == 1
    assert si.last_generation == 1
    assert si.lucene_version == (9, 5, 0)
    assert si.id == COMMIT_ID
    assert si.user_data == {}
    assert si.index_created_version_major == 9

    assert {s.name for s in si.segments} == set(SCI_IDS)
    for sci in si.segments:
        assert sci.sci_id == SCI_IDS[sci.name]  # sci.get_id() in the rs test
        assert sci.codec == "Lucene95"
        assert sci.del_count == 0
        assert sci.soft_del_count == 0
        assert sci.del_gen is None
        assert sci.field_infos_gen is None
        assert sci.doc_values_gen is None
        assert sci.next_write_del_gen == 1
        assert sci.next_write_field_infos_gen == 1
        assert sci.next_write_doc_values_gen == 1
        assert sci.field_infos_files == set()
        assert sci.doc_values_update_files == {}


def test_golden_segments_crc_detects_corruption(tmp_path):
    raw = open(os.path.join(FIXTURE, "segments_1"), "rb").read()
    check_footer(raw)  # clean bytes verify
    for pos in (10, len(raw) // 2, len(raw) - 9):
        bad = bytearray(raw)
        bad[pos] ^= 0x01
        with pytest.raises(CorruptIndexError):
            check_footer(bytes(bad))


def _fixture_segment_info(name: str) -> SegmentInfo:
    diagnostics = {
        "java.runtime.version": "17.0.6+10-jvmci-22.3-b13",
        "java.vendor": "GraalVM Community",
        "java.version": "17.0.6",
        "java.vm.version": "17.0.6+10-jvmci-22.3-b13",
        "lucene.version": "9.5.0",
        "os": "Mac OS X",
        "os.arch": "aarch64",
        "os.version": "13.1",
        "timestamp": TIMESTAMPS[name],
    }
    if name == "_c":
        diagnostics["source"] = "merge"
        diagnostics["mergeFactor"] = "10"
        diagnostics["mergeMaxNumSegments"] = "-1"
        # rs test: merged segment has 10 diagnostics entries; flushed 8.
        # Drop the two jvm-detail keys so counts match the fixture.
        del diagnostics["java.version"]
        del diagnostics["java.vm.version"]
    else:
        diagnostics["source"] = "flush"
        del diagnostics["java.version"]
        del diagnostics["java.vm.version"]
        del diagnostics["timestamp"]
        diagnostics["timestamp"] = TIMESTAMPS[name]
    # keep exactly the documented sizes: 8 for flush, 10 for merge
    assert len(diagnostics) == (10 if name == "_c" else 8)
    seg_id = SCI_IDS[name][:-2] + "00"  # distinct from the sci id
    return SegmentInfo(
        name=name,
        id=seg_id,
        version=(9, 5, 0),
        min_version=(9, 5, 0),
        max_doc=MAX_DOCS[name],
        is_compound_file=name != "_c",
        diagnostics=diagnostics,
        attributes={"Lucene90StoredFieldsFormat.mode": "BEST_SPEED"},
        files=FILES[name],
    )


def _fixture_commit(tmp_path) -> str:
    segs = []
    for name in ("_0", "_b", "_c"):
        info = _fixture_segment_info(name)
        segs.append(
            SegmentCommitInfo(
                name=name,
                id=info.id,
                codec="Lucene95",
                info=info,
                del_count=0,
                soft_del_count=0,
                del_gen=None,
                field_infos_gen=None,
                doc_values_gen=None,
                sci_id=SCI_IDS[name],
            )
        )
    si = SegmentIndex(
        id=COMMIT_ID,
        lucene_version=(9, 5, 0),
        index_created_version_major=9,
        generation=1,
        last_generation=1,
        version=28,
        counter=13,
        user_data={},
        segments=segs,
    )
    write_segment_index(si, str(tmp_path))
    return str(tmp_path)


def test_si_roundtrip_matches_rfc_database_assertions(tmp_path):
    """The .si-resident half of rfc_database.rs, via write->read of the
    documented values through the full read_segment_index path."""
    d = _fixture_commit(tmp_path)
    si = read_segment_index(d)  # load_si=True: parses every .si + CRC

    assert si.version == 28 and si.generation == 1
    assert si.lucene_version == (9, 5, 0)
    assert si.id == COMMIT_ID
    assert not si.user_data

    seen = set()
    for sci in si.segments:
        name = {701: "_0", 572: "_b", 7885: "_c"}[sci.info.max_doc]
        seen.add(name)
        assert sci.sci_id == SCI_IDS[name]
        assert sci.del_count == 0 and sci.soft_del_count == 0
        assert sci.del_gen is None
        assert sci.field_infos_gen is None and sci.doc_values_gen is None
        assert sci.next_write_del_gen == 1
        assert sci.next_write_field_infos_gen == 1
        assert sci.next_write_doc_values_gen == 1
        assert sci.info.min_version == (9, 5, 0)
        assert sci.info.version == (9, 5, 0)
        assert sci.info.index_sort == []
        assert sci.info.name == name
        assert sci.info.attributes == {
            "Lucene90StoredFieldsFormat.mode": "BEST_SPEED"
        }
        diags = sci.info.diagnostics
        assert len(diags) == (10 if name == "_c" else 8)
        assert diags["java.runtime.version"] == "17.0.6+10-jvmci-22.3-b13"
        assert diags["java.vendor"] == "GraalVM Community"
        assert diags["lucene.version"] == "9.5.0"
        assert diags["os"] == "Mac OS X"
        assert diags["os.version"] == "13.1"
        assert diags["os.arch"] == "aarch64"
        assert diags["timestamp"] == TIMESTAMPS[name]
        if name == "_c":
            assert diags["source"] == "merge"
            assert diags["mergeFactor"] == "10"
            assert diags["mergeMaxNumSegments"] == "-1"
        else:
            assert diags["source"] == "flush"
        assert sci.info.files == FILES[name]
    assert seen == {"_0", "_b", "_c"}


def test_si_wrong_id_rejected(tmp_path):
    d = _fixture_commit(tmp_path)
    with pytest.raises(CorruptIndexError, match="object id"):
        read_segment_info(d, "_0", "00" * 16)


def test_si_crc_detects_corruption(tmp_path):
    d = _fixture_commit(tmp_path)
    p = os.path.join(d, "_b.si")
    raw = bytearray(open(p, "rb").read())
    raw[len(raw) // 2] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(CorruptIndexError, match="checksum"):
        read_segment_index(d)


def test_generation_discovery_and_base36(tmp_path):
    assert generation_to_string(0) == "0"
    assert generation_to_string(10) == "a"
    assert generation_to_string(36) == "10"
    assert find_latest_commit(["segments_1", "segments_a", "x"]) == (
        "segments_a",
        10,
    )
    assert find_latest_commit(["segments"]) == ("segments", 0)
    assert find_latest_commit(["write.lock"]) is None
    # a newer generation wins even when listed first
    assert find_latest_commit(["segments_b", "segments_2"])[0] == "segments_b"


def test_index_sort_roundtrip(tmp_path):
    """Index-sort metadata survives the .si round trip — including typed
    missing values (the BasicSortFieldProvider wire format)."""
    info = _fixture_segment_info("_0")
    info.index_sort = [
        SortFieldSpec("title", "STRING", False, "FIRST"),
        SortFieldSpec("rank", "INT", True, -7),
        SortFieldSpec("score_f", "FLOAT", False, 1.5),
        SortFieldSpec("ts", "LONG", True, 123456789012345),
        # positive only: a negative double's bit pattern needs a 10-byte
        # varint, which the 9-byte vi64 cap (reference parity) rejects
        SortFieldSpec("score_d", "DOUBLE", False, 2.25),
        SortFieldSpec("plain", "DOC", False, None),
    ]
    open(os.path.join(tmp_path, "_0.si"), "wb").write(write_segment_info(info))
    back = read_segment_info(str(tmp_path), "_0", info.id)
    assert back.index_sort == info.index_sort


def test_deletions_roundtrip(tmp_path):
    """del_count / soft_del_count / generations survive the commit
    round trip (the live-docs bookkeeping the reference reads)."""
    info = _fixture_segment_info("_0")
    sci = SegmentCommitInfo(
        name="_0",
        id=info.id,
        codec="Lucene95",
        info=info,
        del_count=17,
        soft_del_count=3,
        del_gen=4,
        field_infos_gen=2,
        doc_values_gen=6,
        sci_id=SCI_IDS["_0"],
        field_infos_files={"_0_2.fnm"},
        doc_values_update_files={3: {"_0_6_Lucene90_0.dvd"}},
    )
    si = SegmentIndex(
        id=COMMIT_ID,
        lucene_version=(9, 5, 0),
        index_created_version_major=9,
        generation=11,  # base-36 'b' suffix on disk
        last_generation=11,
        version=99,
        counter=2,
        user_data={"commit_source": "test"},
        segments=[sci],
    )
    write_segment_index(si, str(tmp_path))
    assert os.path.exists(os.path.join(tmp_path, "segments_b"))
    back = read_segment_index(str(tmp_path))
    b = back.segments[0]
    assert (b.del_count, b.soft_del_count) == (17, 3)
    assert (b.del_gen, b.field_infos_gen, b.doc_values_gen) == (4, 2, 6)
    assert b.next_write_del_gen == 5
    assert b.field_infos_files == {"_0_2.fnm"}
    assert b.doc_values_update_files == {3: {"_0_6_Lucene90_0.dvd"}}
    assert back.user_data == {"commit_source": "test"}
    assert back.generation == 11
    assert back.files() == {
        "segments_b", "_0_2.fnm", "_0_6_Lucene90_0.dvd", *FILES["_0"],
    }
