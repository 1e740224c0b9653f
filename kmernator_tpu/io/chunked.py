"""Chunked ReadSet streaming: bounded-memory iteration over FASTQ files.

The host-side analogue of the reference's ReadSetStream
(ref: src/ReadSet.h:656-748): the file is mmap'd and consumed in
chunk_bytes windows cut at pair-preserving record boundaries
(ref: ReadFileReader::seekToNextRecord, src/ReadFileReader.h:657-740), so
peak host memory is O(chunk) regardless of input size.  The quality base
is detected once on the first chunk and forced for the rest (the reference
examines only the first 20000 reads too, ref: src/ReadSet.h:171-209).

gz inputs stream through zlib sequentially (no random access), cut at the
same pair-preserving boundaries — bounded memory either way.  The parallel
worker-pool engine needs byte ranges, so gz inputs use the sequential
engine (apps/filter_reads gates on the extension).
"""
from __future__ import annotations

from typing import Iterator, List

import numpy as np

from kmernator_tpu.io.reads import (ReadSet, find_next_record, open_maybe_gzip,
                                    parse_fastq_bytes)


def chunk_ranges(paths: List[str], chunk_bytes: int):
    """Record-aligned (file_idx, path, start, end) ranges — the exact
    boundaries stream_readsets would cut, computable up front so a worker
    pool can own chunks independently."""
    out = []
    for fi, path in enumerate(paths):
        data = open_maybe_gzip(path, use_mmap=not path.endswith(".gz"))
        if bytes(data[:1]) == b">":
            raise ValueError("chunk_ranges supports FASTQ only")
        size = len(data)
        pos = 0
        while pos < size:
            end = min(pos + chunk_bytes, size)
            if end < size:
                end = find_next_record(data, end, by_pair=True)
            out.append((fi, path, pos, end))
            pos = end
        del data
    return out


def read_chunk(path: str, start: int, end: int, base: int,
               comment_stored: bool, file_idx: int) -> ReadSet:
    """Parse one chunk_ranges() range into a ReadSet (quality base forced)."""
    data = open_maybe_gzip(path, use_mmap=not path.endswith(".gz"))
    chunk = bytes(data[start:end])
    del data
    rs = ReadSet()
    rs.append_arrays(*parse_fastq_bytes(chunk, comment_stored),
                     file_idx=file_idx)
    rs.detect_quality_base(base, limit=0)
    return rs


def _gz_chunks(path: str, chunk_bytes: int) -> Iterator[bytes]:
    """Record-aligned decompressed chunks of a gz FASTQ, one sequential
    pass in bounded memory (gz has no random access, so the file streams
    through zlib while the cut points follow the same pair-preserving
    record-boundary rule as the mmap path)."""
    import gzip
    carry = b""
    with gzip.open(path, "rb") as f:
        while True:
            data = f.read(chunk_bytes)
            if not data:
                if carry:
                    yield carry
                return
            buf = carry + data
            if len(buf) < chunk_bytes:
                carry = buf
                continue
            cut = find_next_record(buf, max(len(buf) - (64 << 10), 0),
                                   by_pair=True)
            if cut <= 0 or cut >= len(buf):
                carry = buf  # no boundary near the tail: grow the chunk
                continue
            yield buf[:cut]
            carry = buf[cut:]


def stream_readsets(paths: List[str], chunk_bytes: int = 32 << 20,
                    output_base_quality: int = 33,
                    comment_stored: bool = True,
                    forced_base: int = 0) -> Iterator[ReadSet]:
    """Yield ReadSet chunks of ~chunk_bytes each, pairs kept intact.
    Each yielded ReadSet carries .file_idx of its source path."""
    base = forced_base or None
    for fi, path in enumerate(paths):
        if path.endswith(".gz"):
            first = True
            for chunk in _gz_chunks(path, chunk_bytes):
                if first and chunk[:1] == b">":
                    raise ValueError("stream_readsets supports FASTQ only; "
                                     "use load_reads for FASTA(+qual)")
                first = False
                rs = ReadSet()
                rs.append_arrays(*parse_fastq_bytes(chunk, comment_stored),
                                 file_idx=fi)
                if base is None:
                    base = rs.detect_quality_base(output_base_quality)
                else:
                    rs.detect_quality_base(base, limit=0)
                yield rs
            continue
        data = open_maybe_gzip(path, use_mmap=True)
        if bytes(data[:1]) == b">":
            raise ValueError("stream_readsets supports FASTQ only; "
                             "use load_reads for FASTA(+qual)")
        size = len(data)
        pos = 0
        while pos < size:
            end = min(pos + chunk_bytes, size)
            if end < size:
                end = find_next_record(data, end, by_pair=True)
            chunk = bytes(data[pos:end])
            rs = ReadSet()
            rs.append_arrays(*parse_fastq_bytes(chunk, comment_stored),
                             file_idx=fi)
            if base is None:
                base = rs.detect_quality_base(output_base_quality)
            else:
                rs.detect_quality_base(base, limit=0)  # force known base
            yield rs
            pos = end
