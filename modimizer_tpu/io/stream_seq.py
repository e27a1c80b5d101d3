"""Parse-ahead FASTA streaming for the device scan pipeline.

The e2e modset build (modutils -a, modutils.c:19-49) spends ~20% of its
wall time parsing the input before the first chunk reaches the device.
This module turns the parse into a producer: the file is read and
record-boundary-split into segments, each segment parsed by the native
parser on a background thread (ctypes releases the GIL, so the parse
genuinely overlaps device compute and the table replay), and the parsed
(codes, offsets) batches stream into ModimizerScanner.scan_kmers_batches.

Segments split at record starts ('\\n>'), so every batch is whole reads
and the concatenated batches are byte-identical to a whole-file parse
(tests/test_stream_scan.py pins equality incl. on gzipped input).
"""

import gzip
import queue
import threading

import numpy as np

_SEG_BYTES = 64 << 20


def _parse_segment(data, conv):
    """Native FASTA parse of one segment -> (codes i8, offsets i64)."""
    from ..native import lib as native_lib
    L = native_lib()
    buf = np.frombuffer(data, np.uint8)
    n = len(buf)
    if n == 0:
        return np.zeros(0, np.int8), np.zeros(1, np.int64)
    n_rec = L.io_fasta_count(buf, n)
    codes = np.empty(n, np.int8)
    offsets = np.zeros(n_rec + 1, np.int64)
    hdr = np.zeros(2 * max(n_rec, 1), np.int64)
    nc = L.io_parse_fasta(buf, n, conv, codes, offsets, hdr)
    return codes[:nc], offsets


def iter_fasta_batches(path, convert, seg_bytes=_SEG_BYTES, depth=2):
    """Yield (codes, offsets) batches of whole FASTA records from `path`
    (plain or gzipped), parsed ahead on a background thread.

    Raises ValueError before the first yield if the content is not FASTA
    (callers fall back to the generic reader)."""
    from .seqio import _full256
    conv = np.ascontiguousarray(_full256(convert), np.int16)
    f = open(path, "rb")
    head = f.read(2)
    f.seek(0)
    if head[:2] == b"\x1f\x8b":
        f = gzip.GzipFile(fileobj=f)
        head = f.read(1)
        f.seek(0)
    if head[:1] != b">":
        f.close()
        raise ValueError(f"{path} is not FASTA")

    q = queue.Queue(maxsize=depth)
    _DONE = object()

    def producer():
        try:
            carry = b""
            while True:
                data = f.read(seg_bytes)
                if not data:
                    if carry:
                        q.put(_parse_segment(carry, conv))
                    break
                data = carry + data
                # split before the last record start so the remainder
                # begins with '>' (a segment holding one giant record
                # keeps growing until its next record or EOF)
                cut = data.rfind(b"\n>")
                if cut < 0:
                    carry = data
                    continue
                seg, carry = data[:cut + 1], data[cut + 1:]
                q.put(_parse_segment(seg, conv))
            q.put(_DONE)
        except BaseException as e:  # surfaced in the consumer
            q.put(e)
        finally:
            f.close()

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _DONE:
            break
        if isinstance(item, BaseException):
            raise item
        yield item
