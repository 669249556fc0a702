/* Fake libopenslide.so.1 for exercising slideio.cpp::OpenSlidePass under CI
 * (VERDICT r1 item 7). Serves a deterministic 2-level synthetic pyramid in
 * openslide's premultiplied-ARGB format, including alpha 0/128/255 pixels so
 * the un-premultiply (_convert.pyd-equivalent) path is fully covered.
 *
 * ABI: the subset of the openslide C API that OpenSlidePass dlsym()s
 * (acmil_tpu/csrc/slideio.cpp:445-520).
 */
#include <stdint.h>
#include <stddef.h>

static int handle_storage;

void *openslide_open(const char *path) { (void)path; return &handle_storage; }
void openslide_close(void *h) { (void)h; }
const char *openslide_get_error(void *h) { (void)h; return NULL; }
int32_t openslide_get_level_count(void *h) { (void)h; return 2; }

void openslide_get_level_dimensions(void *h, int32_t level, int64_t *w,
                                    int64_t *ht) {
  (void)h;
  if (level == 0) { *w = 512; *ht = 384; }
  else            { *w = 256; *ht = 192; }
}

double openslide_get_level_downsample(void *h, int32_t level) {
  (void)h;
  return level == 0 ? 1.0 : 2.0;
}

/* x, y are level-0 coordinates (openslide convention); pixel value is a
 * pure function of the level coordinate so Python can predict it. */
void openslide_read_region(void *h, uint32_t *dest, int64_t x, int64_t y,
                           int32_t level, int64_t w, int64_t ht) {
  (void)h;
  int64_t ds = level == 0 ? 1 : 2;
  int64_t i = 0;
  for (int64_t yy = 0; yy < ht; ++yy) {
    for (int64_t xx = 0; xx < w; ++xx, ++i) {
      int64_t gx = x / ds + xx, gy = y / ds + yy;
      uint32_t a = (gx % 3 == 0) ? 255u : ((gx % 3 == 1) ? 128u : 0u);
      uint32_t r = (uint32_t)((gx + level) & 0xff);
      uint32_t g = (uint32_t)(gy & 0xff);
      uint32_t b = (uint32_t)((gx ^ gy) & 0xff);
      /* premultiply, as openslide does */
      r = r * a / 255u; g = g * a / 255u; b = b * a / 255u;
      dest[i] = (a << 24) | (r << 16) | (g << 8) | b;
    }
  }
}
