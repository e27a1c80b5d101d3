"""fzopen-equivalent IO: transparent gzip on write, auto-detect on read.

The reference persists every binary structure through fzopen (utils.c:108-127),
whose write path is zlib's gzopen — so .mod/.ref/.readset files on disk are
gzip streams.  For byte-identical output we reproduce zlib's gz framing
exactly: header 1f 8b 08 00 <mtime=0> 00 <OS=3>, raw deflate at level 6,
crc32 + isize trailer.
"""

import zlib

_GZ_HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"


class GzWriter:
    """File-like writer producing byte-identical output to zlib gzopen(...,"w")."""

    def __init__(self, path_or_file):
        if hasattr(path_or_file, "write"):
            self._f = path_or_file
            self._own = False
        else:
            self._f = open(path_or_file, "wb")
            self._own = True
        self._c = zlib.compressobj(6, zlib.DEFLATED, -15)
        self._crc = 0
        self._len = 0
        self._f.write(_GZ_HEADER)

    def write(self, data):
        # zero-copy: crc32/compress take any C-contiguous buffer (numpy
        # arrays included) — a bytes() copy here doubled the write cost of
        # the multi-hundred-MB .mod/.ref payloads
        if not isinstance(data, (bytes, bytearray, memoryview)):
            data = memoryview(data).cast("B")
        self._crc = zlib.crc32(data, self._crc)
        self._len += data.nbytes if isinstance(data, memoryview) else len(data)
        out = self._c.compress(data)
        if out:
            self._f.write(out)

    def close(self):
        self._f.write(self._c.flush())
        self._f.write(self._crc.to_bytes(4, "little"))
        self._f.write((self._len & 0xFFFFFFFF).to_bytes(4, "little"))
        if self._own:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_maybe_gz(path) -> bytearray:
    """Read a whole file, transparently decompressing gzip (like gzread).

    Returns a writable bytearray so structure loaders (Modset.from_bytes)
    can wrap the payload without another whole-buffer copy."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        return bytearray(zlib.decompress(data, 16 + zlib.MAX_WBITS))
    return bytearray(data)


def open_maybe_gz(path):
    """Open for buffered byte reading with transparent gzip."""
    import gzip
    import io
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f))
    return f
