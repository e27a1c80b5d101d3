"""seqhoco: homopolymer compression to gzipped FASTA stdout (reference: seqhoco.c).

Parity note: the comparison is case-insensitive and keeps the first-seen
character's original case (seqhoco.c:30).  The reference also appends one
garbage byte per sequence (its loop reads one past the sequence end and
converts it through an out-of-bounds table index — the value depends on the
binary's data layout); we emit the evident intent instead: no trailing byte.
"""

import sys

import numpy as np

from ..io import seqio
from .common import die


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    fn = argv[0] if argv else "-"
    try:
        batch, _t = seqio.read_seq_file(fn, seqio.dna2textConv, is_qual=False,
                                        want_ids=True)
    except (IOError, ValueError, FileNotFoundError):
        die("failed to read sequence file %s", fn)
    wr = seqio.SeqWriter("-z", seqio.FASTA, seqio.dna2textConv, 0)
    for i in range(batch.n):
        seq = batch.seq(i).view(np.uint8)
        if len(seq) == 0:
            break  # reference stops at the first empty sequence (seqhoco.c:26)
        upper = np.where((seq >= ord("a")) & (seq <= ord("z")), seq - 32, seq)
        keep = np.ones(len(seq), bool)
        keep[1:] = upper[1:] != upper[:-1]  # case-insensitive run collapse
        hoco = seq[keep]  # keep first-seen original case
        wr.write(batch.ids[i] or None, None, hoco.tobytes(), None)
    wr.close()


if __name__ == "__main__":
    main()
