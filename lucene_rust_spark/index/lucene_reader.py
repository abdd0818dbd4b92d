"""Read REAL Lucene index commit metadata: ``segments_N`` + per-segment
``.si`` files, with codec header/footer framing and CRC-32 verification.

This is the migration entry point for a user coming from an actual
Lucene index: before this repo's parquet manifest analog takes over, we
can open the on-disk commit the same way Lucene's ``SegmentInfos.
readCommit`` does and enumerate segments, doc counts, deletions, file
sets and diagnostics.

Behavioral parity (formats are the public Apache Lucene 9.x file
formats; the reference implements the same read path):

- ``segments_N`` layout: reference ``core/src/index/segment_index.rs``
  (``SegmentIndex::read_from``, generation discovery, base-36 suffix).
- ``.si`` layout: reference ``core/src/codec/lucene_90/segment_info.rs``
  (``Lucene90SegmentInfoFormat``) — used unchanged by the Lucene91-95
  codecs.
- Codec header/footer + VByte/string primitives: reference
  ``core/src/codec.rs`` and ``core/src/io/encoding.rs``; golden byte
  vectors for those primitives already pass in ``tests/test_kernels``.
- Index-sort fields: reference ``core/src/search/sort.rs``
  (``BasicSortFieldProvider``; SortedNumeric/SortedSet are ``todo!`` in
  the reference as well and raise here).

One deliberate superset: the reference declares ``FOOTER_MAGIC`` but
never checks footers; we implement the full ``CodecUtil.checkFooter``
contract — footer magic, algorithm id 0, and the big-endian CRC-32 of
every preceding byte must match (``zlib.crc32``).

The reference's golden fixture ships only ``segments_1`` as real bytes
(its ``.si``/``.cfs`` files are git-lfs pointer stubs), so: the
``segments_N`` reader is validated byte-for-byte against the real
golden commit (CRC verified), and the ``.si`` reader against
write→read round-trips of the fixture's documented values (this module
also implements the write side of both formats).

Scale note: commit metadata is KB-sized whatever the index size, so
this is driver-side by design — the distributed work starts after the
segment inventory is known (one Spark task per segment, exactly how the
parquet-manifest path shards by segment).
"""

from __future__ import annotations

import os
import re
import zlib
from dataclasses import dataclass, field

CODEC_MAGIC = b"\x3f\xd7\x6c\x17"
FOOTER_MAGIC = b"\xc0\x28\x93\xe8"
FOOTER_LEN = 16  # magic(4) + algorithm_id(4) + crc32-as-u64(8)

SEGMENTS_CODEC = "segments"
SEGMENT_INDEX_VERSION_7_4 = 9
SEGMENT_INDEX_VERSION_8_6 = 10

ID_LENGTH = 16
MAX_DOCS = (1 << 31) - 128  # IndexWriter.MAX_DOCS

# codecs whose segment-info format is Lucene90SegmentInfoFormat
_LUCENE90_SI_CODECS = {"Lucene90", "Lucene91", "Lucene92", "Lucene94", "Lucene95"}


class CorruptIndexError(Exception):
    pass


class UnsupportedCodecError(Exception):
    pass


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


class DataInput:
    """Positional reader over one whole file's bytes (commit metadata is
    KB-sized; whole-buffer reads keep CRC verification trivial)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_bytes(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise CorruptIndexError(
                f"unexpected EOF: need {n} bytes at offset {self.pos}, "
                f"file has {len(self.data)}"
            )
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_u8(self) -> int:
        return self.read_bytes(1)[0]

    def read_u32_be(self) -> int:
        return int.from_bytes(self.read_bytes(4), "big")

    def read_i32_be(self) -> int:
        return int.from_bytes(self.read_bytes(4), "big", signed=True)

    def read_i64_be(self) -> int:
        return int.from_bytes(self.read_bytes(8), "big", signed=True)

    def read_i32_le(self) -> int:
        return int.from_bytes(self.read_bytes(4), "little", signed=True)

    def read_vint(self, max_bytes: int = 5) -> int:
        b = self.read_u8()
        result = b & 0x7F
        shift = 7
        n_read = 1
        while b & 0x80:
            if n_read >= max_bytes:
                raise CorruptIndexError(
                    f"varint longer than {max_bytes} bytes at offset {self.pos}"
                )
            b = self.read_u8()
            n_read += 1
            result |= (b & 0x7F) << shift
            shift += 7
        return result

    def read_vlong(self) -> int:
        return self.read_vint(max_bytes=9)

    def read_string(self) -> str:
        n = self.read_vint()
        if n < 0:
            raise CorruptIndexError(f"negative string length {n}")
        return self.read_bytes(n).decode("utf-8")

    def read_short_string(self) -> str:
        return self.read_bytes(self.read_u8()).decode("utf-8")

    def read_string_map(self) -> dict[str, str]:
        n = max(self.read_vint(), 0)
        return {self.read_string(): self.read_string() for _ in range(n)}

    def read_string_set(self) -> set[str]:
        n = max(self.read_vint(), 0)
        return {self.read_string() for _ in range(n)}

    def read_id(self) -> str:
        return self.read_bytes(ID_LENGTH).hex()


def check_footer(data: bytes, name: str = "<file>") -> int:
    """Verify the Lucene codec footer: footer magic, algorithm id 0, and
    the stored big-endian CRC-32 of every byte before the checksum
    field. Returns the verified checksum."""
    if len(data) < FOOTER_LEN:
        raise CorruptIndexError(f"{name}: file shorter than a codec footer")
    footer = DataInput(data[-FOOTER_LEN:])
    magic = footer.read_bytes(4)
    if magic != FOOTER_MAGIC:
        raise CorruptIndexError(f"{name}: invalid footer magic {magic.hex()}")
    algorithm = footer.read_u32_be()
    if algorithm != 0:
        raise CorruptIndexError(f"{name}: unknown checksum algorithm {algorithm}")
    stored = int.from_bytes(footer.read_bytes(8), "big")
    actual = zlib.crc32(data[:-8]) & 0xFFFFFFFF
    if stored != actual:
        raise CorruptIndexError(
            f"{name}: checksum failed — stored {stored:#010x}, "
            f"actual {actual:#010x}"
        )
    return stored


def check_header(r: DataInput, codec: str, min_version: int, max_version: int) -> int:
    """Codec header: magic + codec name + big-endian u32 version."""
    magic = r.read_bytes(4)
    if magic != CODEC_MAGIC:
        raise CorruptIndexError(f"invalid codec header magic {magic.hex()}")
    actual = r.read_string()
    if actual != codec:
        raise CorruptIndexError(f"codec name {actual!r} != expected {codec!r}")
    version = r.read_u32_be()
    if not (min_version <= version <= max_version):
        raise UnsupportedCodecError(
            f"codec {codec} version {version} outside [{min_version}, {max_version}]"
        )
    return version


def check_index_header(
    r: DataInput,
    codec: str,
    min_version: int,
    max_version: int,
    expected_id: str | None,
    expected_suffix: str,
) -> tuple[int, str]:
    """Index header: codec header + 16-byte object id + short suffix."""
    version = check_header(r, codec, min_version, max_version)
    obj_id = r.read_id()
    if expected_id is not None and obj_id != expected_id:
        raise CorruptIndexError(f"object id {obj_id} != expected {expected_id}")
    suffix = r.read_short_string()
    if suffix != expected_suffix:
        raise CorruptIndexError(
            f"index header suffix {suffix!r} != expected {expected_suffix!r}"
        )
    return version, obj_id


# ---------------------------------------------------------------------------
# sort fields (index sort recorded in .si)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SortFieldSpec:
    field: str
    type: str  # Java enum name: STRING / INT / FLOAT / LONG / DOUBLE / ...
    reverse: bool
    missing_value: object | None


def _read_sort_field(r: DataInput) -> SortFieldSpec:
    field_name = r.read_string()
    type_name = r.read_string()
    reverse = r.read_vint() == 1
    has_missing = r.read_vint() == 1
    missing: object | None = None
    if has_missing:
        import struct

        if type_name == "STRING":
            missing = "FIRST" if r.read_vint() == 1 else "LAST"
        elif type_name == "INT":
            v = r.read_vint()  # Java readVInt: 5-byte varint is a signed i32
            missing = v - (1 << 32) if v >= (1 << 31) else v
        elif type_name == "FLOAT":
            missing = struct.unpack("<f", struct.pack("<I", r.read_vint() & 0xFFFFFFFF))[0]
        elif type_name == "LONG":
            missing = r.read_vlong()
        elif type_name == "DOUBLE":
            missing = struct.unpack(
                "<d", struct.pack("<Q", r.read_vlong() & 0xFFFFFFFFFFFFFFFF)
            )[0]
        else:
            raise CorruptIndexError(
                f"sort field type {type_name} cannot carry a missing value"
            )
    return SortFieldSpec(field_name, type_name, reverse, missing)


def _read_index_sort(r: DataInput) -> list[SortFieldSpec]:
    num = r.read_vint()
    if num < 0:
        raise CorruptIndexError(f"negative sort field count {num}")
    fields = []
    for _ in range(num):
        provider = r.read_string()
        if provider != "SortField":
            # same boundary as the reference (todo! for the other two)
            raise UnsupportedCodecError(
                f"sort field provider {provider!r} not supported"
            )
        fields.append(_read_sort_field(r))
    return fields


# ---------------------------------------------------------------------------
# .si — Lucene90SegmentInfoFormat
# ---------------------------------------------------------------------------


@dataclass
class SegmentInfo:
    name: str
    id: str
    version: tuple[int, int, int]
    min_version: tuple[int, int, int] | None
    max_doc: int
    is_compound_file: bool
    diagnostics: dict[str, str]
    attributes: dict[str, str]
    files: set[str]
    index_sort: list[SortFieldSpec] = field(default_factory=list)


def _read_version_i32_le(r: DataInput) -> tuple[int, int, int]:
    major, minor, bugfix = r.read_i32_le(), r.read_i32_le(), r.read_i32_le()
    for v in (major, minor, bugfix):
        if not 0 <= v <= 255:
            raise CorruptIndexError(f"invalid version component {v}")
    return (major, minor, bugfix)


def _read_version_vint(r: DataInput) -> tuple[int, int, int]:
    major, minor, bugfix = r.read_vint(), r.read_vint(), r.read_vint()
    for v in (major, minor, bugfix):
        if not 0 <= v <= 255:
            raise CorruptIndexError(f"invalid version component {v}")
    return (major, minor, bugfix)


def read_segment_info(dir_path: str, segment_name: str, segment_id: str) -> SegmentInfo:
    """Parse ``<name>.si`` (Lucene90SegmentInfo format, versions 9.0-9.5),
    verifying the CRC footer and that the header's object id matches the
    id recorded for this segment in ``segments_N``."""
    si_path = os.path.join(dir_path, segment_name + ".si")
    with open(si_path, "rb") as f:
        data = f.read()
    check_footer(data, si_path)
    r = DataInput(data)
    check_index_header(r, "Lucene90SegmentInfo", 0, 0, segment_id, "")
    version = _read_version_i32_le(r)
    has_min = r.read_u8()
    if has_min not in (0, 1):
        raise CorruptIndexError(f"invalid has_min_version flag {has_min}")
    min_version = _read_version_i32_le(r) if has_min else None
    doc_count = r.read_i32_le()
    if doc_count < 0:
        raise CorruptIndexError(f"negative doc count {doc_count}")
    is_compound = r.read_u8() == 1
    diagnostics = r.read_string_map()
    files = r.read_string_set()
    attributes = r.read_string_map()
    index_sort = _read_index_sort(r)
    return SegmentInfo(
        name=segment_name,
        id=segment_id,
        version=version,
        min_version=min_version,
        max_doc=doc_count,
        is_compound_file=is_compound,
        diagnostics=diagnostics,
        attributes=attributes,
        files=files,
        index_sort=index_sort,
    )


# ---------------------------------------------------------------------------
# segments_N — SegmentInfos.readCommit
# ---------------------------------------------------------------------------


@dataclass
class SegmentCommitInfo:
    # identity read from segments_N itself (always present even when the
    # .si payload is unavailable — e.g. a git-lfs stub checkout)
    name: str
    id: str
    codec: str
    info: SegmentInfo | None
    del_count: int
    soft_del_count: int
    del_gen: int | None
    field_infos_gen: int | None
    doc_values_gen: int | None
    sci_id: str | None
    field_infos_files: set[str] = field(default_factory=set)
    doc_values_update_files: dict[int, set[str]] = field(default_factory=dict)

    @property
    def next_write_del_gen(self) -> int:
        return 1 if self.del_gen is None else self.del_gen + 1

    @property
    def next_write_field_infos_gen(self) -> int:
        return 1 if self.field_infos_gen is None else self.field_infos_gen + 1

    @property
    def next_write_doc_values_gen(self) -> int:
        return 1 if self.doc_values_gen is None else self.doc_values_gen + 1


@dataclass
class SegmentIndex:
    id: str
    lucene_version: tuple[int, int, int]
    index_created_version_major: int
    generation: int
    last_generation: int
    version: int
    counter: int
    user_data: dict[str, str]
    segments: list[SegmentCommitInfo]

    def files(self, include_segment_index: bool = True) -> set[str]:
        out: set[str] = set()
        if include_segment_index:
            out.add("segments_" + generation_to_string(self.generation))
        for sci in self.segments:
            if sci.info is not None:
                out |= sci.info.files
            out |= sci.field_infos_files
            for fs in sci.doc_values_update_files.values():
                out |= fs
        return out


def generation_to_string(gen: int) -> str:
    """Base-36 generation suffix (``Long.toString(gen, Character.MAX_RADIX)``)."""
    if gen == 0:
        return "0"
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"
    out = []
    while gen:
        out.append(digits[gen % 36])
        gen //= 36
    return "".join(reversed(out))


_SEGMENTS_RE = re.compile(r"^segments(?:_([0-9a-z]+))?$")


def find_latest_commit(file_names: list[str]) -> tuple[str, int] | None:
    """Latest ``segments_N`` file and its generation (base-36 suffix).
    ``segments.gen`` (pre-4.0) is rejected; pending commits ignored."""
    best: tuple[str, int] | None = None
    for name in file_names:
        if name == "segments.gen":
            raise UnsupportedCodecError("pre-4.0 segments.gen index is unsupported")
        m = _SEGMENTS_RE.match(name)
        if not m:
            continue
        gen = int(m.group(1), 36) if m.group(1) else 0
        if best is None or gen > best[1]:
            best = (name, gen)
    return best


def read_segment_index(dir_path: str, load_si: bool = True) -> SegmentIndex:
    """Open the latest commit in a real Lucene index directory — the
    ``SegmentIndex::open`` / ``SegmentInfos.readLatestCommit`` entry
    point. Verifies CRC footers on ``segments_N`` and every ``.si``.

    ``load_si=False`` skips the per-segment ``.si`` payloads (each
    ``SegmentCommitInfo.info`` is None) — needed e.g. when a checkout
    holds git-lfs pointer stubs instead of the segment files."""
    latest = find_latest_commit(os.listdir(dir_path))
    if latest is None:
        raise CorruptIndexError(f"no segments_N file found in {dir_path}")
    file_name, generation = latest
    path = os.path.join(dir_path, file_name)
    with open(path, "rb") as f:
        data = f.read()
    check_footer(data, path)
    r = DataInput(data)

    fmt, commit_id = check_index_header(
        r,
        SEGMENTS_CODEC,
        SEGMENT_INDEX_VERSION_7_4,
        SEGMENT_INDEX_VERSION_8_6,
        None,
        generation_to_string(generation),
    )

    lucene_version = _read_version_vint(r)
    created_major = r.read_vint()
    if lucene_version[0] < created_major:
        raise CorruptIndexError(
            f"index created by major {created_major} but oldest segment "
            f"version is {lucene_version}"
        )

    version = r.read_i64_be()
    if version < 0:
        raise CorruptIndexError(f"negative commit version {version}")
    counter = r.read_vlong()
    num_segments = r.read_i32_be()
    if num_segments < 0:
        raise CorruptIndexError(f"negative segment count {num_segments}")
    min_segment_version = _read_version_vint(r) if num_segments > 0 else None

    total_docs = 0
    segments: list[SegmentCommitInfo] = []
    for _ in range(num_segments):
        seg_name = r.read_string()
        seg_id = r.read_id()
        codec_name = r.read_string()
        if codec_name not in _LUCENE90_SI_CODECS:
            raise UnsupportedCodecError(f"unknown codec {codec_name!r}")
        info = read_segment_info(dir_path, seg_name, seg_id) if load_si else None
        max_doc = info.max_doc if info is not None else None
        if max_doc is not None:
            total_docs += max_doc

        del_gen = r.read_i64_be()
        del_count = r.read_i32_be()
        field_infos_gen = r.read_i64_be()
        dv_gen = r.read_i64_be()
        soft_del_count = r.read_i32_be()
        if del_count < 0 or (max_doc is not None and del_count > max_doc):
            raise CorruptIndexError(
                f"segment {seg_name}: del_count {del_count} out of range"
            )
        if soft_del_count < 0 or (max_doc is not None and soft_del_count > max_doc):
            raise CorruptIndexError(
                f"segment {seg_name}: soft_del_count {soft_del_count} out of range"
            )
        if max_doc is not None and del_count + soft_del_count > max_doc:
            raise CorruptIndexError(
                f"segment {seg_name}: total deletions exceed max_doc"
            )

        sci_id = None
        if fmt > SEGMENT_INDEX_VERSION_7_4:
            marker = r.read_u8()
            if marker == 1:
                sci_id = r.read_id()
            elif marker != 0:
                raise CorruptIndexError(f"invalid SegmentCommitInfo marker {marker}")

        sci = SegmentCommitInfo(
            name=seg_name,
            id=seg_id,
            codec=codec_name,
            info=info,
            del_count=del_count,
            soft_del_count=soft_del_count,
            del_gen=None if del_gen < 0 else del_gen,
            field_infos_gen=None if field_infos_gen < 0 else field_infos_gen,
            doc_values_gen=None if dv_gen < 0 else dv_gen,
            sci_id=sci_id,
        )
        sci.field_infos_files = r.read_string_set()
        n_dv_fields = r.read_i32_be()
        for _ in range(max(n_dv_fields, 0)):
            key = r.read_i32_be()
            sci.doc_values_update_files[key] = r.read_string_set()

        if sci.info is not None:
            seg_version = sci.info.version
            if min_segment_version is not None and seg_version < min_segment_version:
                raise CorruptIndexError(
                    f"segment {seg_name} version {seg_version} below commit "
                    f"minimum {min_segment_version}"
                )
            if created_major >= 7 and seg_version[0] < created_major:
                raise CorruptIndexError(
                    f"segment {seg_name} version {seg_version} below index "
                    f"created major {created_major}"
                )
            if created_major >= 7 and sci.info.min_version is None:
                raise CorruptIndexError(
                    f"segment {seg_name} missing min_version on a >=7.x index"
                )
        segments.append(sci)

    user_data = r.read_string_map()
    if total_docs > MAX_DOCS:
        raise CorruptIndexError(f"too many documents: {total_docs}")

    return SegmentIndex(
        id=commit_id,
        lucene_version=lucene_version,
        index_created_version_major=created_major,
        generation=generation,
        last_generation=generation,
        version=version,
        counter=counter,
        user_data=user_data,
        segments=segments,
    )


# ---------------------------------------------------------------------------
# write side — same wire formats, used for round-trip validation and to
# emit a Lucene-readable commit for the parquet-manifest bridge
# ---------------------------------------------------------------------------


class DataOutput:
    def __init__(self) -> None:
        self.buf = bytearray()

    def write_bytes(self, b: bytes) -> None:
        self.buf += b

    def write_u8(self, v: int) -> None:
        self.buf.append(v & 0xFF)

    def write_u32_be(self, v: int) -> None:
        self.buf += (v & 0xFFFFFFFF).to_bytes(4, "big")

    def write_i32_be(self, v: int) -> None:
        self.buf += int(v).to_bytes(4, "big", signed=True)

    def write_i64_be(self, v: int) -> None:
        self.buf += int(v).to_bytes(8, "big", signed=True)

    def write_i32_le(self, v: int) -> None:
        self.buf += int(v).to_bytes(4, "little", signed=True)

    def write_vint(self, v: int) -> None:
        v &= 0xFFFFFFFF  # Java writeVInt: negative i32 -> 5-byte varint
        self._write_varint(v)

    def write_vlong(self, v: int) -> None:
        if v < 0:
            raise ValueError("vlong must be non-negative")
        self._write_varint(v)

    def _write_varint(self, v: int) -> None:
        while v >= 0x80:
            self.buf.append((v & 0x7F) | 0x80)
            v >>= 7
        self.buf.append(v)

    def write_string(self, s: str) -> None:
        b = s.encode("utf-8")
        self.write_vint(len(b))
        self.buf += b

    def write_short_string(self, s: str) -> None:
        b = s.encode("utf-8")
        if len(b) > 255:
            raise ValueError("short string longer than 255 bytes")
        self.write_u8(len(b))
        self.buf += b

    def write_string_map(self, m: dict[str, str]) -> None:
        self.write_vint(len(m))
        for k in sorted(m):
            self.write_string(k)
            self.write_string(m[k])

    def write_string_set(self, s: set[str]) -> None:
        self.write_vint(len(s))
        for k in sorted(s):
            self.write_string(k)

    def write_id(self, hex_id: str) -> None:
        b = bytes.fromhex(hex_id)
        if len(b) != ID_LENGTH:
            raise ValueError(f"id must be {ID_LENGTH} bytes, got {len(b)}")
        self.buf += b

    def write_header(self, codec: str, version: int) -> None:
        self.write_bytes(CODEC_MAGIC)
        self.write_string(codec)
        self.write_u32_be(version)

    def write_index_header(
        self, codec: str, version: int, obj_id: str, suffix: str
    ) -> None:
        self.write_header(codec, version)
        self.write_id(obj_id)
        self.write_short_string(suffix)

    def finish_with_footer(self) -> bytes:
        self.write_bytes(FOOTER_MAGIC)
        self.write_u32_be(0)
        crc = zlib.crc32(bytes(self.buf)) & 0xFFFFFFFF
        self.buf += crc.to_bytes(8, "big")
        return bytes(self.buf)


def write_segment_info(info: SegmentInfo) -> bytes:
    """Serialize one segment's ``.si`` payload (Lucene90SegmentInfo)."""
    w = DataOutput()
    w.write_index_header("Lucene90SegmentInfo", 0, info.id, "")
    for v in info.version:
        w.write_i32_le(v)
    if info.min_version is None:
        w.write_u8(0)
    else:
        w.write_u8(1)
        for v in info.min_version:
            w.write_i32_le(v)
    w.write_i32_le(info.max_doc)
    w.write_u8(1 if info.is_compound_file else 0)
    w.write_string_map(info.diagnostics)
    w.write_string_set(info.files)
    w.write_string_map(info.attributes)
    w.write_vint(len(info.index_sort))
    for sf in info.index_sort:
        w.write_string("SortField")
        w.write_string(sf.field)
        w.write_string(sf.type)
        w.write_vint(1 if sf.reverse else 0)
        if sf.missing_value is None:
            w.write_vint(0)
        else:
            import struct

            w.write_vint(1)
            if sf.type == "STRING":
                w.write_vint(1 if sf.missing_value == "FIRST" else 0)
            elif sf.type == "INT":
                w.write_vint(int(sf.missing_value))
            elif sf.type == "FLOAT":
                w.write_vint(
                    struct.unpack("<I", struct.pack("<f", sf.missing_value))[0]
                )
            elif sf.type == "LONG":
                w.write_vlong(int(sf.missing_value))
            elif sf.type == "DOUBLE":
                bits = struct.unpack("<Q", struct.pack("<d", sf.missing_value))[0]
                if bits >= 1 << 63:
                    # would need a 10-byte varint; the wire format's
                    # 9-byte vi64 cap (reference parity) cannot read it
                    raise ValueError(
                        "negative DOUBLE missing values are not "
                        "representable in the vi64 wire format"
                    )
                w.write_vlong(bits)
            else:
                raise ValueError(
                    f"sort field type {sf.type} cannot carry a missing value"
                )
    return w.finish_with_footer()


def write_segment_index(si: SegmentIndex, dir_path: str) -> str:
    """Write a full commit: every segment's ``.si`` plus
    ``segments_<gen>``. Returns the segments file path. Each
    ``SegmentCommitInfo`` must carry a loaded ``info``."""
    for sci in si.segments:
        if sci.info is None:
            raise ValueError(f"segment {sci.name} has no loaded SegmentInfo")
        with open(os.path.join(dir_path, sci.name + ".si"), "wb") as f:
            f.write(write_segment_info(sci.info))

    w = DataOutput()
    w.write_index_header(
        SEGMENTS_CODEC,
        SEGMENT_INDEX_VERSION_8_6,
        si.id,
        generation_to_string(si.generation),
    )
    for v in si.lucene_version:
        w.write_vint(v)
    w.write_vint(si.index_created_version_major)
    w.write_i64_be(si.version)
    w.write_vlong(si.counter)
    w.write_i32_be(len(si.segments))
    if si.segments:
        min_ver = min(s.info.version for s in si.segments)
        for v in min_ver:
            w.write_vint(v)
    for sci in si.segments:
        w.write_string(sci.name)
        w.write_id(sci.id)
        w.write_string(sci.codec)
        w.write_i64_be(-1 if sci.del_gen is None else sci.del_gen)
        w.write_i32_be(sci.del_count)
        w.write_i64_be(-1 if sci.field_infos_gen is None else sci.field_infos_gen)
        w.write_i64_be(-1 if sci.doc_values_gen is None else sci.doc_values_gen)
        w.write_i32_be(sci.soft_del_count)
        if sci.sci_id is None:
            w.write_u8(0)
        else:
            w.write_u8(1)
            w.write_id(sci.sci_id)
        w.write_string_set(sci.field_infos_files)
        w.write_i32_be(len(sci.doc_values_update_files))
        for key in sorted(sci.doc_values_update_files):
            w.write_i32_be(key)
            w.write_string_set(sci.doc_values_update_files[key])
    w.write_string_map(si.user_data)

    seg_path = os.path.join(dir_path, "segments_" + generation_to_string(si.generation))
    with open(seg_path, "wb") as f:
        f.write(w.finish_with_footer())
    return seg_path
