/* Native packet-file text IO (runtime counterpart of the reference's
 * write_packets, packet.cc:165-190).
 *
 * The sn3d-compatible packets00_NNNN.out files are ~30 columns x npkts rows;
 * Python-level per-token formatting dominates end-of-run IO at production
 * packet counts, so the row formatting loop lives here. Columns arrive as a
 * dense row-major float64 matrix plus a per-column kind string ('i' integer,
 * 'f' float printed with %g).
 *
 * Built on first use via ctypes (see artis_tpu/io/packetio.py), with a
 * numpy/python fallback when no compiler is available.
 */

#include <math.h>
#include <stdio.h>
#include <string.h>

long packetio_write_text(const char *path, const char *header,
                         const double *data, long nrows, long ncols,
                         const char *kinds) {
  FILE *f = fopen(path, "w");
  if (!f) {
    return -1;
  }
  if (header && header[0]) {
    fputs(header, f);
    fputc('\n', f);
  }
  char buf[64];
  for (long r = 0; r < nrows; r++) {
    const double *row = data + (size_t)r * ncols;
    for (long c = 0; c < ncols; c++) {
      if (c) {
        fputc(' ', f);
      }
      if (kinds[c] == 'i') {
        snprintf(buf, sizeof buf, "%lld", (long long)llround(row[c]));
      } else {
        snprintf(buf, sizeof buf, "%g", row[c]);
      }
      fputs(buf, f);
    }
    fputc('\n', f);
  }
  if (fclose(f) != 0) {
    return -1;
  }
  return nrows;
}
