/* Linux shim providing BSD funopen() on top of glibc fopencookie().
 *
 * The reference's fzopen (utils.c:108-127) builds a FILE* over a gzFile via
 * funopen(), which glibc lacks.  This shim lets us compile the unmodified
 * reference sources on Linux to produce golden outputs for parity tests.
 * Only the gzread/gzwrite/gzseek/gzclose call pattern used there is supported.
 */
#define _GNU_SOURCE
#include <stdio.h>
#include <stdlib.h>

typedef int (*shim_read_fn)(void *, char *, int);
typedef int (*shim_write_fn)(void *, const char *, int);
typedef long (*shim_seek_fn)(void *, long, int); /* gzseek ABI: (gzFile, z_off_t, int) */
typedef int (*shim_close_fn)(void *);

struct shim_cookie {
  void *inner;
  shim_read_fn readfn;
  shim_write_fn writefn;
  shim_seek_fn seekfn;
  shim_close_fn closefn;
};

static ssize_t shim_read(void *v, char *buf, size_t n) {
  struct shim_cookie *c = v;
  if (!c->readfn) return -1;
  return c->readfn(c->inner, buf, (int)n);
}

static ssize_t shim_write(void *v, const char *buf, size_t n) {
  struct shim_cookie *c = v;
  if (!c->writefn) return -1;
  return c->writefn(c->inner, buf, (int)n);
}

static int shim_seek(void *v, off64_t *off, int whence) {
  struct shim_cookie *c = v;
  long r;
  if (!c->seekfn) return -1;
  r = c->seekfn(c->inner, (long)*off, whence);
  if (r < 0) return -1;
  *off = r;
  return 0;
}

static int shim_close(void *v) {
  struct shim_cookie *c = v;
  int r = c->closefn ? c->closefn(c->inner) : 0;
  free(c);
  return r;
}

FILE *funopen(const void *cookie, shim_read_fn readfn, shim_write_fn writefn,
              shim_seek_fn seekfn, shim_close_fn closefn) {
  struct shim_cookie *c = malloc(sizeof(struct shim_cookie));
  cookie_io_functions_t io = {shim_read, shim_write, shim_seek, shim_close};
  const char *mode = writefn ? (readfn ? "r+" : "w") : "r";
  if (!c) return NULL;
  c->inner = (void *)cookie;
  c->readfn = readfn;
  c->writefn = writefn;
  c->seekfn = seekfn;
  c->closefn = closefn;
  return fopencookie(c, mode, io);
}
