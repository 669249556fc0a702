/* Fake libkfbslide.so for exercising slideio.cpp::KfbSlideNative under CI
 * (VERDICT r1 item 7). Mirrors the proprietary KFBio reader's tile
 * semantics (`wsi_core/KfbSlide/kfbslide.py:92-120` in the reference):
 * kfbslide_read_region returns ONE JPEG-compressed tile anchored at a
 * 256-aligned level coordinate; edge tiles are smaller; the caller
 * assembles regions from covering tiles and frees each tile buffer via
 * kfb_delete_imagedata.
 *
 * Tile bytes come from $FAKE_KFB_TILE_DIR/tile_<level>_<x>_<y>.jpg written
 * by the test harness, so this stub needs no JPEG encoder.
 */
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int handle_storage;

void *kfbslide_open(const char *path) { (void)path; return &handle_storage; }
void kfbslide_close(void *h) { (void)h; }
int32_t kfbslide_get_level_count(void *h) { (void)h; return 2; }

void kfbslide_get_level_dimensions(void *h, int32_t level, int64_t *w,
                                   int64_t *ht) {
  (void)h;
  if (level == 0) { *w = 600; *ht = 520; }
  else            { *w = 300; *ht = 260; }
}

double kfbslide_get_level_downsample(void *h, int32_t level) {
  (void)h;
  return level == 0 ? 1.0 : 2.0;
}

uint8_t kfbslide_read_region(void *h, int32_t level, int64_t x, int64_t y,
                             int *data_len, uint8_t **pix) {
  (void)h;
  const char *dir = getenv("FAKE_KFB_TILE_DIR");
  if (!dir) return 0;
  char path[4096];
  snprintf(path, sizeof(path), "%s/tile_%d_%lld_%lld.jpg", dir, (int)level,
           (long long)x, (long long)y);
  FILE *f = fopen(path, "rb");
  if (!f) return 0; /* tile outside the slide / missing */
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  uint8_t *buf = (uint8_t *)malloc((size_t)n);
  if (fread(buf, 1, (size_t)n, f) != (size_t)n) {
    fclose(f);
    free(buf);
    return 0;
  }
  fclose(f);
  *data_len = (int)n;
  *pix = buf;
  return 1;
}

uint8_t kfb_delete_imagedata(uint8_t *pix) {
  free(pix);
  return 1;
}
