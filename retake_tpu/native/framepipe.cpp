// Native host-side data pipeline for retake-tpu.
//
// The reference delegates frame IO to cv2/ffmpeg + torchvision transforms
// (demo.py:27-45, dataset_utils.py:49-83); on TPU VMs this host work is the
// same CPU-side bottleneck, and the benchmark hosts here have extremely slow
// memory, so every numpy pass over frame data costs seconds. This module does
// the whole frame pipeline in single passes:
//
//   * JPEG decode (libjpeg) of pre-extracted benchmark frames
//   * longest-side NEAREST downscale (parity with the reference resize,
//     demo.py:84-104)
//   * Qwen2-VL patchify: uint8 frames -> normalized float32 flattened patches
//     in the spatial-merge block order, fusing rescale+normalize+9-D
//     transpose into one pass (HF processor semantics)
//
// Exposed through ctypes (see native/__init__.py). Threads: a small pthread
// pool parallelizes across frames when cores are available.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Decode one JPEG file; writes RGB uint8 into out (caller-allocated, cap
// bytes). Returns 0 on success and fills *w, *h.
int rt_decode_jpeg(const char* path, uint8_t* out, long cap, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const long need = (long)cinfo.output_width * cinfo.output_height * 3;
  if (need > cap) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -3;
  }
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  const int stride = cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (long)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return 0;
}

// NEAREST resize (PIL-compatible pixel centers: src = floor((i+0.5)*scale)).
void rt_resize_nearest(const uint8_t* src, int sh, int sw, uint8_t* dst,
                       int dh, int dw) {
  std::vector<int> xmap(dw);
  const double sx = (double)sw / dw, sy = (double)sh / dh;
  for (int x = 0; x < dw; ++x) {
    int v = (int)((x + 0.5) * sx);
    xmap[x] = std::min(v, sw - 1);
  }
  for (int y = 0; y < dh; ++y) {
    int syi = std::min((int)((y + 0.5) * sy), sh - 1);
    const uint8_t* srow = src + (long)syi * sw * 3;
    uint8_t* drow = dst + (long)y * dw * 3;
    for (int x = 0; x < dw; ++x) {
      memcpy(drow + x * 3, srow + xmap[x] * 3, 3);
    }
  }
}

// Decode n JPEG frame files and longest-side resize into a packed
// [n, out_h, out_w, 3] buffer. paths: concatenated NUL-separated strings.
// All frames must share the source dimensions of the first (benchmark frame
// dirs do). Returns 0 on success and fills *out_h/*out_w.
int rt_load_frames(const char* paths, int n, int resolution, uint8_t* out,
                   int* out_h, int* out_w, int threads) {
  std::vector<const char*> files(n);
  const char* p = paths;
  for (int i = 0; i < n; ++i) {
    files[i] = p;
    p += strlen(p) + 1;
  }
  // probe the first frame for dimensions
  int sw = 0, sh = 0;
  {
    FILE* f = fopen(files[0], "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    sw = cinfo.image_width;
    sh = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
  }
  int dh = sh, dw = sw;
  if (std::max(sh, sw) > resolution && resolution > 0) {
    double factor = (double)resolution / std::max(sh, sw);
    dw = (int)(sw * factor);
    dh = (int)(sh * factor);
  }
  *out_h = dh;
  *out_w = dw;
  const long frame_bytes = (long)dh * dw * 3;
  std::atomic<int> next(0), err(0);
  auto worker = [&]() {
    std::vector<uint8_t> raw((long)sh * sw * 3);
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || err.load()) break;
      int w = 0, h = 0;
      if (rt_decode_jpeg(files[i], raw.data(), (long)raw.size(), &w, &h)) {
        err.store(1);
        break;
      }
      if (w != sw || h != sh) {
        err.store(2);
        break;
      }
      if (dh == sh && dw == sw) {
        memcpy(out + (long)i * frame_bytes, raw.data(), frame_bytes);
      } else {
        rt_resize_nearest(raw.data(), sh, sw, out + (long)i * frame_bytes,
                          dh, dw);
      }
    }
  };
  int nt = std::max(1, std::min(threads, n));
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return err.load();
}

// Qwen2-VL patchify: frames [T, H, W, 3] uint8 (H, W multiples of ps*merge)
// -> out float32 [grid_t * gh * gw, 3 * tps * ps * ps] in spatial-merge block
// order, normalized (x/255 - mean) / std. Temporal tail repeats last frame.
int rt_patchify_qwen(const uint8_t* frames, int T, int H, int W, int ps,
                     int tps, int merge, const float* mean, const float* std_,
                     float* out, int threads) {
  const int gh = H / ps, gw = W / ps;
  const int grid_t = (T + tps - 1) / tps;
  const int row_len = 3 * tps * ps * ps;
  const long frame_px = (long)H * W * 3;
  float inv255_scale[3], bias[3];
  for (int c = 0; c < 3; ++c) {
    inv255_scale[c] = 1.0f / (255.0f * std_[c]);
    bias[c] = -mean[c] / std_[c];
  }
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int gt = next.fetch_add(1);
      if (gt >= grid_t) break;
      for (int hb = 0; hb < gh / merge; ++hb) {
        for (int wb = 0; wb < gw / merge; ++wb) {
          for (int mh = 0; mh < merge; ++mh) {
            for (int mw = 0; mw < merge; ++mw) {
              const int ph_idx = hb * merge + mh;  // patch row
              const int pw_idx = wb * merge + mw;  // patch col
              const long row_idx =
                  ((long)gt * (gh / merge) * (gw / merge) + (long)hb * (gw / merge) + wb) *
                      merge * merge +
                  mh * merge + mw;
              float* dst = out + row_idx * row_len;
              // row layout: [c][t in tps][ps][ps]
              for (int c = 0; c < 3; ++c) {
                for (int dt = 0; dt < tps; ++dt) {
                  int t = std::min(gt * tps + dt, T - 1);
                  const uint8_t* fr = frames + (long)t * frame_px;
                  for (int py = 0; py < ps; ++py) {
                    const uint8_t* srow =
                        fr + ((long)(ph_idx * ps + py) * W + pw_idx * ps) * 3;
                    float* drow =
                        dst + ((c * tps + dt) * ps + py) * ps;
                    for (int px = 0; px < ps; ++px) {
                      drow[px] =
                          srow[px * 3 + c] * inv255_scale[c] + bias[c];
                    }
                  }
                }
              }
            }
          }
        }
      }
    }
  };
  int nt = std::max(1, std::min(threads, grid_t));
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return 0;
}

}  // extern "C"
