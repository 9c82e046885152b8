/* Generate an INDEPENDENT-ENCODER progressive-JPEG fixture (ADVICE
 * round-5, low #3): the repo's progressive decoder was previously
 * validated only against its own encoder + hand-pinned streams, so a
 * mirrored misreading of T.81 §G.2 (e.g. EOB-run correction-bit
 * placement) could hide. This program uses the system libjpeg-turbo
 * (an implementation with zero shared code or authorship with the
 * repo) to:
 *   1. encode a deterministic 48x32 RGB test pattern as BASELINE and
 *      as PROGRESSIVE (jpeg_simple_progression: the standard 10-scan
 *      spectral-selection + successive-approximation script — exactly
 *      the §G.2 shapes), quality 75, default 4:2:0 subsampling;
 *   2. decode both back with libjpeg itself and dump raw RGB.
 * Outputs (checked into tests/fixtures/jpeg/):
 *   libjpeg_prog.jpg  libjpeg_base.jpg  libjpeg_prog.rgb  libjpeg_base.rgb
 * Build/run:  gcc scripts/gen_libjpeg_fixture.c -ljpeg -o /tmp/genj && /tmp/genj tests/fixtures/jpeg
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

#define W 48
#define H 32

static void fill_pattern(unsigned char *rgb) {
    /* gradient + block texture + a hard edge: populates DC, low- and
     * high-frequency AC coefficients so the progressive scans carry
     * real EOB runs and correction bits. */
    for (int y = 0; y < H; y++)
        for (int x = 0; x < W; x++) {
            unsigned char *p = rgb + 3 * (y * W + x);
            p[0] = (unsigned char)((x * 7 + y * 3) & 0xFF);
            p[1] = (unsigned char)((x * 5 + y * 11 + ((x / 4 + y / 4) & 1 ? 90 : 0)) & 0xFF);
            p[2] = (unsigned char)(x < W / 2 ? (x * 13 + y * 17) & 0xFF : 230);
        }
}

static void encode(const unsigned char *rgb, int progressive, const char *path) {
    struct jpeg_compress_struct c;
    struct jpeg_error_mgr jerr;
    FILE *f = fopen(path, "wb");
    if (!f) { perror(path); exit(1); }
    c.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&c);
    jpeg_stdio_dest(&c, f);
    c.image_width = W; c.image_height = H;
    c.input_components = 3; c.in_color_space = JCS_RGB;
    jpeg_set_defaults(&c);
    jpeg_set_quality(&c, 75, TRUE);
    if (progressive) jpeg_simple_progression(&c);
    c.optimize_coding = TRUE;
    jpeg_start_compress(&c, TRUE);
    while (c.next_scanline < c.image_height) {
        JSAMPROW row = (JSAMPROW)(rgb + 3 * W * c.next_scanline);
        jpeg_write_scanlines(&c, &row, 1);
    }
    jpeg_finish_compress(&c);
    jpeg_destroy_compress(&c);
    fclose(f);
}

static void decode(const char *jpg, const char *raw) {
    struct jpeg_decompress_struct d;
    struct jpeg_error_mgr jerr;
    FILE *f = fopen(jpg, "rb");
    FILE *o = fopen(raw, "wb");
    if (!f || !o) { perror("decode io"); exit(1); }
    d.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&d);
    jpeg_stdio_src(&d, f);
    jpeg_read_header(&d, TRUE);
    jpeg_start_decompress(&d);
    unsigned char *row = malloc(3 * d.output_width);
    while (d.output_scanline < d.output_height) {
        JSAMPROW r = row;
        jpeg_read_scanlines(&d, &r, 1);
        fwrite(row, 3, d.output_width, o);
    }
    free(row);
    jpeg_finish_decompress(&d);
    jpeg_destroy_decompress(&d);
    fclose(f); fclose(o);
}

int main(int argc, char **argv) {
    const char *dir = argc > 1 ? argv[1] : ".";
    char p[512];
    unsigned char rgb[3 * W * H];
    fill_pattern(rgb);
    snprintf(p, sizeof p, "%s/libjpeg_base.jpg", dir); encode(rgb, 0, p);
    snprintf(p, sizeof p, "%s/libjpeg_prog.jpg", dir); encode(rgb, 1, p);
    snprintf(p, sizeof p, "%s/libjpeg_base.jpg", dir);
    char q[512]; snprintf(q, sizeof q, "%s/libjpeg_base.rgb", dir); decode(p, q);
    snprintf(p, sizeof p, "%s/libjpeg_prog.jpg", dir);
    snprintf(q, sizeof q, "%s/libjpeg_prog.rgb", dir); decode(p, q);
    printf("wrote 4 fixtures to %s (%dx%d)\n", dir, W, H);
    return 0;
}
