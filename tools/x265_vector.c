/* External-vector generator for the HEVC pixel tier (r14): drives the
 * system libx265.so.199 (x265 3.5, an independently-authored encoder —
 * NOT our code) to produce an Annex-B stream plus the encoder's own
 * reconstruction, which together form the external ground truth the
 * in-repo decoder is pinned against (fixtures/x265_*.bin): if our
 * §8.x transcriptions were wrong anywhere on the exercised path, the
 * decoded pixels could not match x265's recon bit-exactly.
 *
 * No x265 headers ship in this container, so the needed API surface is
 * declared locally from the public x265.h (stable prefix; the
 * x265_picture field prefix pts..forceqp has been append-only since
 * 1.x and is sanity-checked after x265_picture_init before use).
 *
 * Build & run (committed fixture provenance — see FIXTURES.md):
 *   gcc -O2 -o /tmp/x265vec tools/x265_vector.c \
 *       -L/usr/lib/x86_64-linux-gnu -l:libx265.so.199
 *   /tmp/x265vec <w> <h> <frames> <in.yuv> <out.265> <recon.yuv> \
 *       [key=value ...]          # extra x265_param_parse pairs
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct x265_param x265_param;
typedef struct x265_encoder x265_encoder;
typedef struct { uint32_t type; uint32_t sizeBytes; uint8_t *payload; } x265_nal;

/* stable prefix of x265_picture (fields appended after forceqp in
 * later builds; allocation uses x265_picture_alloc so the real size is
 * whatever build 199 wants) */
typedef struct {
  int64_t pts, dts;
  void *userData;
  void *planes[3];
  int stride[3];
  int bitDepth, sliceType, poc, colorSpace, forceqp;
} x265_pic_prefix;

extern x265_param *x265_param_alloc(void);
extern void x265_param_free(x265_param *);
extern int x265_param_default_preset(x265_param *, const char *, const char *);
extern int x265_param_parse(x265_param *, const char *, const char *);
extern int x265_param_apply_profile(x265_param *, const char *);
extern x265_encoder *x265_encoder_open_199(x265_param *);
extern int x265_encoder_encode(x265_encoder *, x265_nal **, uint32_t *,
                               void *, void *);
extern void x265_encoder_close(x265_encoder *);
extern void *x265_picture_alloc(void);
extern void x265_picture_init(x265_param *, void *);
extern void x265_picture_free(void *);
extern void x265_cleanup(void);

static void die(const char *m) { fprintf(stderr, "FATAL: %s\n", m); exit(1); }

static void write_recon(FILE *f, x265_pic_prefix *r, int w, int h) {
  for (int y = 0; y < h; y++)
    fwrite((uint8_t *)r->planes[0] + (size_t)y * r->stride[0], 1, w, f);
  for (int c = 1; c <= 2; c++)
    for (int y = 0; y < h / 2; y++)
      fwrite((uint8_t *)r->planes[c] + (size_t)y * r->stride[c], 1, w / 2, f);
}

int main(int argc, char **argv) {
  if (argc < 7) die("usage: w h frames in.yuv out.265 recon.yuv [k=v...]");
  int w = atoi(argv[1]), h = atoi(argv[2]), frames = atoi(argv[3]);
  FILE *fin = fopen(argv[4], "rb");
  FILE *fout = fopen(argv[5], "wb");
  FILE *frec = fopen(argv[6], "wb");
  if (!fin || !fout || !frec) die("open files");

  x265_param *p = x265_param_alloc();
  if (!p) die("param_alloc");
  if (x265_param_default_preset(p, "medium", NULL)) die("preset");
  char res[32];
  snprintf(res, sizeof res, "%dx%d", w, h);
  if (x265_param_parse(p, "input-res", res)) die("input-res");
  if (x265_param_parse(p, "fps", "25")) die("fps");
  if (x265_param_parse(p, "input-csp", "i420")) die("csp");
  /* deterministic, single-threaded, headers in stream, no SEI */
  const char *fixed[][2] = {
    {"repeat-headers", "1"}, {"annexb", "1"}, {"aud", "0"},
    {"info", "0"}, {"hrd", "0"}, {"frame-threads", "1"},
    {"pools", "1"}, {"wpp", "0"}, {"qp", "27"}, /* qp ⇒ CQP mode */
  };
  for (size_t i = 0; i < sizeof fixed / sizeof fixed[0]; i++)
    if (x265_param_parse(p, fixed[i][0], fixed[i][1]) < 0) die(fixed[i][0]);
  for (int i = 7; i < argc; i++) {
    char *eq = strchr(argv[i], '=');
    if (!eq) die("extra args must be key=value");
    *eq = 0;
    if (x265_param_parse(p, argv[i], eq + 1) < 0) die(argv[i]);
  }
  if (x265_param_apply_profile(p, "main")) die("profile main");

  x265_encoder *enc = x265_encoder_open_199(p);
  if (!enc) die("encoder_open");

  x265_pic_prefix *pin = x265_picture_alloc();
  x265_pic_prefix *prec = x265_picture_alloc();
  x265_picture_init(p, pin);
  x265_picture_init(p, prec);
  /* layout sanity: init must have put 8-bit i420 in the prefix slots */
  if (pin->bitDepth != 8 || pin->colorSpace != 1)
    die("x265_picture prefix layout mismatch — refuse to continue");

  size_t lsz = (size_t)w * h, csz = lsz / 4;
  uint8_t *buf = malloc(frames * (lsz + 2 * csz));
  if (fread(buf, 1, frames * (lsz + 2 * csz), fin) !=
      frames * (lsz + 2 * csz))
    die("short yuv input");

  x265_nal *nals; uint32_t n;
  int sent = 0, got = 0;
  for (sent = 0; sent < frames; sent++) {
    uint8_t *f0 = buf + (size_t)sent * (lsz + 2 * csz);
    pin->planes[0] = f0;
    pin->planes[1] = f0 + lsz;
    pin->planes[2] = f0 + lsz + csz;
    pin->stride[0] = w; pin->stride[1] = w / 2; pin->stride[2] = w / 2;
    pin->pts = sent;
    int r = x265_encoder_encode(enc, &nals, &n, pin, prec);
    if (r < 0) die("encode");
    for (uint32_t i = 0; i < n; i++)
      fwrite(nals[i].payload, 1, nals[i].sizeBytes, fout);
    if (r > 0) { write_recon(frec, prec, w, h); got++; }
  }
  for (;;) { /* flush */
    int r = x265_encoder_encode(enc, &nals, &n, NULL, prec);
    if (r < 0) die("flush");
    for (uint32_t i = 0; i < n; i++)
      fwrite(nals[i].payload, 1, nals[i].sizeBytes, fout);
    if (r > 0) { write_recon(frec, prec, w, h); got++; }
    if (r == 0) break;
  }
  fprintf(stderr, "encoded %d frames, recon %d\n", sent, got);
  if (got != frames) die("recon count != frames");
  fclose(fin); fclose(fout); fclose(frec);
  x265_encoder_close(enc);
  x265_picture_free(pin); x265_picture_free(prec);
  x265_param_free(p); x265_cleanup();
  return 0;
}
