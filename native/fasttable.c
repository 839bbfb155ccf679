/* fasttable: native float-table parser for the artis_tpu data layer.
 *
 * The reference reads its large whitespace-separated inputs (model.txt with
 * up to 10^7 rows, abundances.txt, atomic data) with C++ stream parsers
 * (reference: grid.cc:1836+ read_ejecta_model, input.cc:912-1255). Python
 * float parsing is ~50x slower, so this module provides the native
 * counterpart: parse a whitespace/newline-separated numeric table straight
 * into a double buffer, skipping '#' comment lines.
 *
 * Exposed via ctypes (no pybind11 in this environment):
 *   long fasttable_count(const char *path)
 *       -> number of numeric tokens (or -1 on error)
 *   long fasttable_parse(const char *path, double *out, long capacity)
 *       -> tokens written (or -1 on error)
 */

#include <errno.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static char *read_whole_file(const char *path, long *size_out) {
    FILE *f = fopen(path, "rb");
    if (!f) return NULL;
    if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return NULL; }
    long size = ftell(f);
    if (size < 0) { fclose(f); return NULL; }
    rewind(f);
    char *buf = (char *)malloc((size_t)size + 1);
    if (!buf) { fclose(f); return NULL; }
    size_t got = fread(buf, 1, (size_t)size, f);
    fclose(f);
    buf[got] = '\0';
    *size_out = (long)got;
    return buf;
}

/* advance past a '#' comment to end of line */
static const char *skip_comment(const char *p) {
    while (*p && *p != '\n') p++;
    return p;
}

long fasttable_parse(const char *path, double *out, long capacity) {
    long size = 0;
    char *buf = read_whole_file(path, &size);
    if (!buf) return -1;
    long n = 0;
    const char *p = buf;
    while (*p) {
        while (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r' || *p == ',') p++;
        if (*p == '#') { p = skip_comment(p); continue; }
        if (!*p) break;
        char *end = NULL;
        errno = 0;
        double v = strtod(p, &end);
        if (end == p) { /* non-numeric token: skip it */
            while (*p && *p != ' ' && *p != '\t' && *p != '\n' && *p != '\r') p++;
            continue;
        }
        if (out) {
            if (n >= capacity) { free(buf); return -1; }
            out[n] = v;
        }
        n++;
        p = end;
    }
    free(buf);
    return n;
}

long fasttable_count(const char *path) {
    return fasttable_parse(path, NULL, 0);
}
