/* Oracle shim for the native arithmetic-JPEG decoder tests.
 *
 * Drives the system libjpeg (which ships arithmetic entropy codecs) to
 * (a) ENCODE raw PPM/PGM pixels as arithmetic-coded JPEG (SOF9 sequential
 * or SOF10 progressive, optional restart interval), and (b) dump the raw
 * quantized DCT COEFFICIENTS of any JPEG via jpeg_read_coefficients. The
 * tests compile this with gcc at run time (skipped when gcc/libjpeg are
 * absent) and pin the native entropy decoder's coefficient output
 * EXACTLY against (b) — coefficients are the rounding-free comparison
 * point between independent JPEG implementations.
 *
 * Usage:
 *   jpeg_arith_shim encode  in.ppm out.jpg quality progressive restart
 *   jpeg_arith_shim coef    in.jpg out.bin
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *msg) { fprintf(stderr, "%s\n", msg); exit(1); }

static unsigned char *read_pnm(const char *path, int *w, int *h, int *ch) {
  FILE *f = fopen(path, "rb");
  char magic[3] = {0};
  int maxv;
  if (!f) die("open input");
  if (fscanf(f, "%2s %d %d %d", magic, w, h, &maxv) != 4) die("pnm header");
  fgetc(f); /* single whitespace */
  *ch = (strcmp(magic, "P6") == 0) ? 3 : 1;
  size_t n = (size_t)(*w) * (*h) * (*ch);
  unsigned char *buf = malloc(n);
  if (fread(buf, 1, n, f) != n) die("pnm body");
  fclose(f);
  return buf;
}

static int do_encode(const char *in, const char *out, int quality,
                     int progressive, int restart) {
  int w, h, ch;
  unsigned char *pix = read_pnm(in, &w, &h, &ch);
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *f = fopen(out, "wb");
  if (!f) die("open output");
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_stdio_dest(&cinfo, f);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = ch;
  cinfo.in_color_space = (ch == 3) ? JCS_RGB : JCS_GRAYSCALE;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  cinfo.arith_code = TRUE; /* the point of this shim */
  cinfo.restart_interval = restart;
  if (progressive) jpeg_simple_progression(&cinfo);
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = pix + (size_t)cinfo.next_scanline * w * ch;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fclose(f);
  free(pix);
  return 0;
}

static int do_coef(const char *in, const char *out) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  FILE *f = fopen(in, "rb");
  FILE *o = fopen(out, "wb");
  jvirt_barray_ptr *arrays;
  int ci;
  if (!f || !o) die("open");
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  arrays = jpeg_read_coefficients(&cinfo);
  if (!arrays) die("read_coefficients");
  /* header: n_components, then per component: blocks_wide, blocks_high */
  {
    int nc = cinfo.num_components;
    fwrite(&nc, sizeof(int), 1, o);
  }
  for (ci = 0; ci < cinfo.num_components; ci++) {
    jpeg_component_info *comp = &cinfo.comp_info[ci];
    int bw = comp->width_in_blocks, bh = comp->height_in_blocks;
    JDIMENSION by;
    fwrite(&bw, sizeof(int), 1, o);
    fwrite(&bh, sizeof(int), 1, o);
    for (by = 0; by < (JDIMENSION)bh; by++) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          (j_common_ptr)&cinfo, arrays[ci], by, 1, FALSE);
      fwrite(rows[0], sizeof(JCOEF), (size_t)bw * DCTSIZE2, o);
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  fclose(o);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 7 && strcmp(argv[1], "encode") == 0)
    return do_encode(argv[2], argv[3], atoi(argv[4]), atoi(argv[5]),
                     atoi(argv[6]));
  if (argc >= 4 && strcmp(argv[1], "coef") == 0)
    return do_coef(argv[2], argv[3]);
  die("usage: encode in.pnm out.jpg q prog restart | coef in.jpg out.bin");
  return 1;
}
