"""Per-command resource reporting, mirroring the reference's timeUpdate/timeTotal.

The reference prints, after every ordered CLI command and at exit, a line
``user\t<u>\tsystem\t<s>\tmax_RSS\t<d>\tmemory\t<m>`` from getrusage deltas
(reference utils.c:176-204).  We keep the exact format so downstream log
parsers work; the numbers themselves are inherently machine-dependent.

The ``memory`` column is the reference's cumulative-allocation counter
(its malloc wrappers count every byte, utils.c:59-75).  Python has no free
equivalent: set MODIMIZER_MEMORY=1 to account it with tracemalloc (real
allocation deltas, ~2x interpreter overhead), otherwise it prints 0.
"""

import os
import resource


class Timer:
    def __init__(self):
        self._first = None
        self._old = None
        self._trace = os.environ.get("MODIMIZER_MEMORY") == "1"
        self._alloc0 = 0
        if self._trace:
            import tracemalloc
            tracemalloc.start()

    def _allocated(self):
        if not self._trace:
            return 0
        import tracemalloc
        return tracemalloc.get_traced_memory()[0]

    @staticmethod
    def _usage():
        return resource.getrusage(resource.RUSAGE_SELF)

    def update(self, f):
        """Print usage since last call (first call just initialises)."""
        new = self._usage()
        alloc = self._allocated()
        if self._old is not None:
            self._print_delta(f, self._old, new, alloc - self._alloc0)
        else:
            self._first = new
            self._first_alloc = alloc
        self._old = new
        self._alloc0 = alloc

    def total(self, f):
        """Print usage since the first update() call."""
        if self._first is None:
            return
        self._old = self._first
        self._alloc0 = getattr(self, "_first_alloc", 0)
        self.update(f)

    @staticmethod
    def _print_delta(f, old, new, alloc=0):
        def split(delta):
            secs = int(delta)
            usecs = int(round((delta - secs) * 1e6))
            if usecs < 0:
                usecs += 1000000
                secs -= 1
            return secs, usecs

        us, uu = split(new.ru_utime - old.ru_utime)
        ss, su = split(new.ru_stime - old.ru_stime)
        f.write("user\t%d.%06d" % (us, uu))
        f.write("\tsystem\t%d.%06d" % (ss, su))
        f.write("\tmax_RSS\t%d" % (new.ru_maxrss - old.ru_maxrss))
        f.write("\tmemory\t%d" % alloc)  # 0 unless MODIMIZER_MEMORY=1
        f.write("\n")
