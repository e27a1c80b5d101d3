/* Prototype for the funopen shim, force-included (-include) when compiling the
 * reference sources on Linux: without it funopen is implicitly declared as
 * returning int, truncating the FILE* to 32 bits at -O2. */
#ifndef FUNOPEN_SHIM_H
#define FUNOPEN_SHIM_H
#include <stdio.h>
FILE *funopen(const void *cookie,
              int (*readfn)(void *, char *, int),
              int (*writefn)(void *, const char *, int),
              fpos_t (*seekfn)(void *, fpos_t, int),
              int (*closefn)(void *));
#endif
