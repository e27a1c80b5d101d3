"""Per-command resource reporting, mirroring the reference's timeUpdate/timeTotal.

The reference prints, after every ordered CLI command and at exit, a line
``user\t<u>\tsystem\t<s>\tmax_RSS\t<d>\tmemory\t<m>`` from getrusage deltas
(reference utils.c:176-204).  We keep the exact format so downstream log
parsers work; the numbers themselves are inherently machine-dependent.
"""

import resource


class Timer:
    def __init__(self):
        self._first = None
        self._old = None

    @staticmethod
    def _usage():
        return resource.getrusage(resource.RUSAGE_SELF)

    def update(self, f):
        """Print usage since last call (first call just initialises)."""
        new = self._usage()
        if self._old is not None:
            self._print_delta(f, self._old, new)
        else:
            self._first = new
        self._old = new

    def total(self, f):
        """Print usage since the first update() call."""
        if self._first is None:
            return
        self._old = self._first
        self.update(f)

    @staticmethod
    def _print_delta(f, old, new):
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
        f.write("\tmemory\t%d" % 0)  # allocation counter n/a under Python
        f.write("\n")
