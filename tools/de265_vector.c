/* External-decoder driver for the HEVC ENCODER tier (r15): drives the
 * system libde265.so.0 (libde265 1.0.11, an independently-authored
 * HEVC DECODER — not our code, and not x265's) to decode an Annex-B
 * stream and dump the decoded planes as I420 YUV.
 *
 * Why it exists: r14's libx265 vectors pin our DECODER against an
 * external encoder. This tool closes the OTHER direction — our
 * ENCODER's streams are decoded by an external conformant decoder and
 * pinned against the encoder's own reconstruction (a conformant
 * encoder is DEFINED by: normative decode of its stream == its recon).
 * It also cross-checks the two external implementations against each
 * other (libde265 decoding the committed x265 vectors must reproduce
 * x265's recon byte-exactly), and externally witnesses the q175 remux
 * invariance claim (decode(remux(s)) == decode(s)).
 *
 * No libde265 headers ship in this container, so the needed API
 * surface is declared locally from the public de265.h (libde265 1.0.x,
 * LGPL; the decode-loop API below has been stable since 1.0).
 *
 * Build & run (committed fixture provenance — see FIXTURES.md):
 *   gcc -O2 -o /tmp/de265vec tools/de265_vector.c -l:libde265.so.0
 *   /tmp/de265vec <in.265> <out.yuv>
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>

typedef void de265_decoder_context; /* opaque */
typedef int de265_error;            /* DE265_OK == 0 */
struct de265_image;                 /* opaque */

extern de265_decoder_context *de265_new_decoder(void);
extern de265_error de265_free_decoder(de265_decoder_context *);
extern de265_error de265_start_worker_threads(de265_decoder_context *, int);
extern de265_error de265_push_data(de265_decoder_context *, const void *,
                                   int, int64_t, void *);
extern de265_error de265_flush_data(de265_decoder_context *);
extern de265_error de265_decode(de265_decoder_context *, int *more);
extern const struct de265_image *
de265_get_next_picture(de265_decoder_context *);
extern void de265_release_next_picture(de265_decoder_context *);
extern int de265_get_image_width(const struct de265_image *, int channel);
extern int de265_get_image_height(const struct de265_image *, int channel);
extern const uint8_t *de265_get_image_plane(const struct de265_image *,
                                            int channel, int *out_stride);
extern const char *de265_get_error_text(de265_error);
extern const char *de265_get_version(void);

static void die(const char *m) { fprintf(stderr, "FATAL: %s\n", m); exit(1); }

static int drain(de265_decoder_context *ctx, FILE *out) {
  int n = 0;
  const struct de265_image *img;
  while ((img = de265_get_next_picture(ctx)) != NULL) {
    for (int c = 0; c < 3; c++) {
      int stride, w = de265_get_image_width(img, c),
                  h = de265_get_image_height(img, c);
      const uint8_t *p = de265_get_image_plane(img, c, &stride);
      for (int y = 0; y < h; y++)
        fwrite(p + (size_t)y * stride, 1, w, out);
    }
    de265_release_next_picture(ctx);
    n++;
  }
  return n;
}

int main(int argc, char **argv) {
  if (argc != 3) die("usage: de265vec <in.265> <out.yuv>");
  FILE *in = fopen(argv[1], "rb");
  if (!in) die("cannot open input");
  fseek(in, 0, SEEK_END);
  long len = ftell(in);
  fseek(in, 0, SEEK_SET);
  uint8_t *buf = malloc(len);
  if (!buf || fread(buf, 1, len, in) != (size_t)len) die("short read");
  fclose(in);

  FILE *out = fopen(argv[2], "wb");
  if (!out) die("cannot open output");

  de265_decoder_context *ctx = de265_new_decoder();
  if (!ctx) die("de265_new_decoder failed");
  /* single-threaded: deterministic decode order, nothing to reorder */
  fprintf(stderr, "libde265 %s\n", de265_get_version());

  de265_error err = de265_push_data(ctx, buf, (int)len, 0, NULL);
  if (err != 0) die(de265_get_error_text(err));
  err = de265_flush_data(ctx);
  if (err != 0) die(de265_get_error_text(err));

  int frames = 0, more = 1;
  while (more) {
    err = de265_decode(ctx, &more);
    if (err != 0 && more) { /* non-fatal (e.g. waiting-for-input at end) */
      fprintf(stderr, "de265_decode: %s\n", de265_get_error_text(err));
    }
    frames += drain(ctx, out);
  }
  frames += drain(ctx, out);

  fclose(out);
  de265_free_decoder(ctx);
  free(buf);
  fprintf(stderr, "decoded %d frames\n", frames);
  if (frames == 0) die("no frames decoded");
  return 0;
}
