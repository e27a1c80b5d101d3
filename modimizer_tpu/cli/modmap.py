"""modmap: reference indexing + query seeding/mapping (reference: modmap.c).

Seeding is batched on the TPU (scan + vectorized table lookup); the greedy
colinear chaining over copy1/copy2 seeds (modmap.c:216-276) is a small
sequential automaton per read, reproduced literally including its quirks
(U32 wraparound in the diagonal-difference test, the n2>2 final-block gate).
"""

import sys

import numpy as np

from ..core.modset import Modset
from ..core.reference import Reference
from ..core.seqhash import Seqhash
from ..io import seqio
from ..ops.seqhash import ModimizerScanner
from ..utils.timers import Timer
from .common import Args, OutFile, die, finish


def usage(params, num_threads):
    e = sys.stderr.write
    e("Usage: modmap <commands>\n")
    e("Commands are executed in order - set parameters before using them!\n")
    e("  -K | --kmer <kmer size> [%d]\n" % params["k"])
    e("  -W | --window <window> [%d]\n" % params["w"])
    e("  -S | --seed <random number seed> [%d]\n" % params["s"])
    e("  -B | --tableBits <hash index table bitcount> [%d]\n" % params["B"])
    e("  -v | --verbose : toggle verbose mode\n")
    e("  -t | --threads <number of threads for parallel ops> [%d]\n" % num_threads)
    e("  -o | --output <output filename> : '-' for stdout\n")
    e("  -f | --referenceFasta <reference fasta file>\n")
    e("  -w | --referenceWrite <file stem> : writes reference hash files\n")
    e("  -r | --referenceRead <file stem> : read reference hash files\n")
    e("  -q | --query <query fasta file>\n")


def _i32(u):
    """C int from U32 arithmetic."""
    u &= 0xFFFFFFFF
    return u - (1 << 32) if u >= (1 << 31) else u


def query_process(ref: Reference, filename, out, is_verbose):
    """queryProcess (modmap.c:188-281)."""
    ms = ref.ms
    try:
        batch, _t = seqio.read_seq_file(filename, seqio.dna2index_n0(),
                                        is_qual=False, want_ids=True)
    except (IOError, ValueError, FileNotFoundError):
        die("failed to read query sequence file %s", filename)
    scanner = ModimizerScanner(ms.hasher, want_isf=False)
    kmers, rid, rpos, _f = scanner.scan_batch(batch)
    sidx = ms.find_batch(kmers)
    info = ms.info
    copyn_all = (info[sidx] & 3).astype(np.int8)
    copyn_all[sidx == 0] = -1  # missed

    rev, loc, offs, ids = ref.rev, ref.loc, ref.offset, ref.id
    dict_names = ref.dict

    bounds = np.searchsorted(rid, np.arange(batch.n + 1))
    lens = batch.lengths
    for r in range(batch.n):
        a, b = bounds[r], bounds[r + 1]
        seeds_idx = sidx[a:b]
        seeds_pos = rpos[a:b]
        cn = copyn_all[a:b]
        n_seeds = b - a
        missed = int((cn < 0).sum())
        c1 = int((cn == 1).sum())
        c2 = int((cn == 2).sum())
        cm = int((cn == 3).sum())
        out.write("Q\t%s\t%d\t%d miss, %d copy1, %d copy2, %d multi, %.2f hit\n"
                  % (batch.ids[r], int(lens[r]), missed, c1, c2, cm,
                     (n_seeds - missed) / n_seeds if n_seeds else float("nan")))

        # greedy colinear chaining (modmap.c:216-276)
        loc0 = 0
        locN = i0 = iN = 0
        n1 = n2 = 0

        def emit_M(n1, n2, i0, iN, loc0, locN):
            denom = (locN - loc0) if locN > loc0 else (loc0 - locN)
            dens = (n1 + n2) / denom if denom else float("inf")
            frac = n1 / c1 if c1 else (float("nan") if n1 == 0 else float("inf"))
            out.write("M\t%s\t%d\t%d\t%d\t%s\t%d\t%d\t%d %d\t%.2f\t%.2f\n"
                      % (batch.ids[r], int(seeds_pos[i0]), int(seeds_pos[iN]),
                         int(seeds_pos[iN]) - int(seeds_pos[i0]),
                         dict_names.name(int(ids[loc0])),
                         int(offs[loc0]), int(offs[locN]), n1, n2,
                         dens, frac))

        for i in range(n_seeds):
            si = int(seeds_idx[i])
            if not si or cn[i] == 3:  # missed or copyM: skip
                continue
            # NB for a copy0 mod absent from the reference the C reads out of
            # bounds here (rev[loc[si]] with depth 0); we clamp instead
            lloc = int(rev[min(int(loc[si]), len(rev) - 1)])
            is1 = cn[i] == 1
            if is_verbose:
                if is1:
                    sys.stdout.write("  %6d\t%s %d\n" % (
                        int(seeds_pos[i]), dict_names.name(int(ids[lloc])),
                        int(offs[lloc])))
                else:
                    loc2 = int(rev[int(loc[si]) + 1])
                    sys.stdout.write("  %6d\t%s %d\t%s %d\n" % (
                        int(seeds_pos[i]), dict_names.name(int(ids[lloc])),
                        int(offs[lloc]), dict_names.name(int(ids[loc2])),
                        int(offs[loc2])))

            def block_test(lv):
                if ids[lv] != ids[loc0]:
                    return True
                if loc0 < locN:
                    if lv < locN:
                        return True
                    d = _i32(locN - loc0 - iN + i0)
                    if d > 50 or d < -50:
                        return True
                elif loc0 > locN:
                    if lv > locN:
                        return True
                    d = _i32(loc0 - locN - iN + i0)
                    if d > 50 or d < -50:
                        return True
                return False

            end_block = (not loc0) or block_test(lloc)
            if end_block and loc0 and not is1:  # try the second occurrence
                lloc = int(rev[min(int(loc[si]) + 1, len(rev) - 1)])
                end_block = block_test(lloc)
            if end_block:
                if n1 > 2:
                    emit_M(n1, n2, i0, iN, loc0, locN)
                n1 = 0
                n2 = 0
                loc0 = lloc
                i0 = i
            if is1:
                n1 += 1
            else:
                n2 += 1
            locN = lloc
            iN = i
        if n2 > 2:  # final-block flush quirk (modmap.c:269)
            emit_M(n1, n2, i0, iN, loc0, locN)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    out = OutFile()
    timer = Timer()
    timer.update(sys.stdout)
    params = {"k": 19, "w": 31, "s": 17, "B": 28}
    num_threads = 1
    is_verbose = False

    if not argv:
        usage(params, num_threads)

    ref = None
    args = Args(argv)
    while args:
        if not args.current.startswith("-"):
            die("option/command %s does not start with '-': run without arguments for usage",
                args.current)
        args.echo_command()

        if (m := args.match("-K", "--kmer", 2)):
            params["k"] = int(m[1])
        elif (m := args.match("-W", "--window", 2)):
            params["w"] = int(m[1])
        elif (m := args.match("-S", "--seed", 2)):
            params["s"] = int(m[1])
        elif (m := args.match("-B", "--tableBits", 2)):
            params["B"] = int(m[1])
        elif (m := args.match("-t", "--threads", 2)):
            sys.stderr.write("  can't set thread number - not compiled with OMP\n")
        elif args.match("-v", "--verbose", 1):
            is_verbose = not is_verbose
        elif (m := args.match("-o", "--output", 2)):
            out.set(m[1])
        elif (m := args.match("-f", "--referenceFasta", 2)):
            if params["k"] <= 0 or params["w"] <= 0:
                die("k %d, w %d must be > 0", params["k"], params["w"])
            hasher = Seqhash.create(params["k"], params["w"], params["s"])
            out.write("  modmap initialised with k = %d, w = %d, random seed = %d\n"
                      % (params["k"], params["w"], params["s"]))
            ms = Modset(hasher, params["B"], 0)
            ref = Reference(ms, 1 << 26)
            try:
                ref.fasta_read(m[1], out, is_add=True)
            except IOError:
                die("failed to read reference sequence file %s", m[1])
            except ValueError as e:
                die("%s", str(e))
        elif (m := args.match("-q", "--query", 2)):
            if not ref:
                die("need to read a reference before processing query sequences")
            import os
            if not os.path.exists(m[1]):
                die("failed to open query file %s", m[1])
            query_process(ref, m[1], out, is_verbose)
        elif (m := args.match("-r", "--referenceRead", 2)):
            ref = Reference.read(m[1])
        elif (m := args.match("-w", "--referenceWrite", 2)):
            ref.write(m[1])
        else:
            die("unkown command %s - run without arguments for usage",
                args.current)

        timer.update(out.f)

    out.write("total resources used: ")
    timer.total(out.f)
    if not out.is_stdout:
        sys.stdout.write("total resources used: ")
        timer.total(sys.stdout)


if __name__ == "__main__":
    main()
