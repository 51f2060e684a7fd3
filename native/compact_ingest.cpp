// Native single-pass yc12 ingest compaction (host -> wire format).
//
// The TPU ingest design ships ONE packed buffer per frame over the ~40 MB/s
// tunnel link (see rgbdslam_v2_tpu/graph/manager.py compact_frame — this is
// its bit-exact C++ twin for the "yc12" format). The Python/numpy packer
// costs ~3 ms/frame of the single host core (five full-plane passes:
// grayscale, dither, bit-pack, depth LUT, chroma); on the fully-serial
// tunnel pipeline (host pack -> wire -> device) that is ~15% of the frame
// budget. This version fuses everything into one pass per plane,
// ~0.3 ms/frame at VGA.
//
// Capability parity note: the reference's ingest is native too (cv_bridge
// image conversion inside roscpp callbacks, openni_listener.cpp:139-217);
// a TPU host additionally has to WIRE-ENCODE the frame, so the encoder is
// part of the native runtime here.
//
// Wire layout (gray_bits=6, depth_bits=10, chroma_mult=4 — the defaults):
//   [Y6 packed H*W*3/4 | depth10 (H/s)*(W/s)*5/4 | Cb (H/cs)*(W/cs) | Cr ..]
//   with cs = chroma_mult*s. gray_bits=8 ships raw Y bytes (H*W);
//   depth_bits=12 ships nibble-packed pairs (3 B / 2 samples);
//   chroma_mult=2 ships the denser 4:2:0-at-2s planes.
//
// Bit-exactness contract (asserted in tests/test_native_compact.py):
//  - Y from RGB: (77R + 150G + 29B) >> 8  — the numpy fallback formula.
//    (The Python path prefers cv2's SIMD cvtColor whose fixed-point
//    rounding differs by at most 1 LSB; when this native packer is
//    available it REPLACES that path entirely, so there is no mixing.)
//  - 6-bit dither: Bayer-4x4 offsets (0..3) + g - (g>>6), clip, >>2 —
//    identical to manager._dither6/_pack6.
//  - depth: u16 -> clip(round(sqrt(d*256)), 0, 4095), nibble-packed pairs —
//    identical to manager._d12_lut/_pack12 (float depth in meters is
//    truncated to u16 at 1/5000 m exactly like np.astype).
//  - chroma: BT.601 floats evaluated in the numpy expression's exact f32
//    order, truncated to u8 (build with -ffp-contract=off so no FMA
//    re-rounding diverges from numpy).
//
// Build: part of librgbd_loader.so (see io/native_loader.py).

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

// _BAYER4 >> 2 (one 6-bit quantization step), tiled 4x4.
const int kBayer6[4][4] = {
    {0, 2, 0, 2}, {3, 1, 3, 1}, {0, 2, 0, 2}, {3, 1, 3, 1}};

// _BAYER4 >> 1 (one 5-bit quantization step), tiled 4x4.
const int kBayer5[4][4] = {
    {0, 4, 1, 5}, {6, 2, 7, 3}, {1, 5, 0, 4}, {7, 3, 6, 2}};

// sqrt-coded depth LUTs: q = round(sqrt(d * 2^(2b-16))) for b quantizer
// bits — u16 range maps onto [0, 2^b), relative step shrinks as 1/sqrt(d)
// (mm-scale near, noise-floor-dominated far; see manager._d12_lut).
uint16_t* d12_lut() {
  static uint16_t lut[65536];
  static bool init = false;
  if (!init) {
    for (int d = 0; d < 65536; ++d) {
      double q = std::nearbyint(std::sqrt(static_cast<double>(d) * 256.0));
      lut[d] = static_cast<uint16_t>(q < 0 ? 0 : (q > 4095 ? 4095 : q));
    }
    init = true;
  }
  return lut;
}

uint16_t* d10_lut() {
  static uint16_t lut[65536];
  static bool init = false;
  if (!init) {
    for (int d = 0; d < 65536; ++d) {
      double q = std::nearbyint(std::sqrt(static_cast<double>(d) * 16.0));
      lut[d] = static_cast<uint16_t>(q < 0 ? 0 : (q > 1023 ? 1023 : q));
    }
    init = true;
  }
  return lut;
}

inline uint8_t clip_u8(int v) {
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

inline uint16_t depth_sample(const uint16_t* drow, const float* frow, int x) {
  if (drow) return drow[x];
  float m = frow[x];
  // NaN/±inf/negative -> 0 (np.nan_to_num + clip semantics)
  if (!(m > 0.0f) || !std::isfinite(m)) m = 0.0f;
  float scaled = m * 5000.0f;
  return scaled >= 65535.0f ? 65535
                            : static_cast<uint16_t>(scaled);  // truncation
}

// ---- shared plane encoders (bit-exact twins of the numpy tails in
// graph/manager.py compact_frame; used by every wire format below) --------

// strided u16 depth -> sqrt code (12-bit pairs -> 3 B or 10-bit quads -> 5 B)
uint8_t* encode_depth_plane(const uint16_t* d16, const float* dmeters, int H,
                            int W, int s, int depth_bits, uint8_t* p) {
  const uint16_t* lut = depth_bits == 10 ? d10_lut() : d12_lut();
  const int group = depth_bits == 10 ? 4 : 2;
  uint16_t qg[4];
  int pn = 0;
  for (int y = 0; y < H; y += s) {
    const uint16_t* drow = d16 ? d16 + static_cast<size_t>(y) * W : nullptr;
    const float* frow =
        dmeters ? dmeters + static_cast<size_t>(y) * W : nullptr;
    for (int x = 0; x < W; x += s) {
      qg[pn++] = lut[depth_sample(drow, frow, x)];
      if (pn == group) {
        if (group == 2) {
          p[0] = static_cast<uint8_t>(qg[0] & 0xFF);
          p[1] = static_cast<uint8_t>(((qg[0] >> 8) & 0x0F) |
                                      ((qg[1] & 0x0F) << 4));
          p[2] = static_cast<uint8_t>(qg[1] >> 4);
          p += 3;
        } else {  // 4 x 10-bit -> 5 B, little-endian bit stream
          p[0] = static_cast<uint8_t>(qg[0] & 0xFF);
          p[1] = static_cast<uint8_t>((qg[0] >> 8) | ((qg[1] & 0x3F) << 2));
          p[2] = static_cast<uint8_t>((qg[1] >> 6) | ((qg[2] & 0x0F) << 4));
          p[3] = static_cast<uint8_t>((qg[2] >> 4) | ((qg[3] & 0x03) << 6));
          p[4] = static_cast<uint8_t>(qg[3] >> 2);
          p += 5;
        }
        pn = 0;
      }
    }
  }
  return p;
}

// chroma at stride cs: BT.601 Cb then Cr planes (numpy f32 evaluation
// order; build with -ffp-contract=off so no FMA re-rounding diverges)
uint8_t* encode_chroma_planes(const uint8_t* rgb, int H, int W, int cs,
                              uint8_t* p) {
  const int hc = (H + cs - 1) / cs, wc = (W + cs - 1) / cs;
  uint8_t* cbp = p;
  uint8_t* crp = p + static_cast<size_t>(hc) * wc;
  if (rgb) {
    for (int y = 0; y < H; y += cs) {
      const uint8_t* rp = rgb + static_cast<size_t>(y) * W * 3;
      for (int x = 0; x < W; x += cs) {
        const uint8_t* px = rp + 3 * x;
        float r = static_cast<float>(px[0]);
        float g = static_cast<float>(px[1]);
        float b = static_cast<float>(px[2]);
        // numpy f32 evaluation order: ((128 - c1*r) - c2*g) + c3*b
        float cb = ((128.0f - static_cast<float>(0.168736) * r) -
                    static_cast<float>(0.331264) * g) +
                   0.5f * b;
        float cr = ((128.0f + 0.5f * r) - static_cast<float>(0.418688) * g) -
                   static_cast<float>(0.081312) * b;
        if (cb < 0.0f) cb = 0.0f;
        if (cb > 255.0f) cb = 255.0f;
        if (cr < 0.0f) cr = 0.0f;
        if (cr > 255.0f) cr = 255.0f;
        *cbp++ = static_cast<uint8_t>(cb);  // truncation, like np.astype
        *crp++ = static_cast<uint8_t>(cr);
      }
    }
  } else {
    std::memset(cbp, 128, static_cast<size_t>(hc) * wc * 2);
  }
  return p + 2 * static_cast<size_t>(hc) * wc;
}

}  // namespace

extern "C" {

// Returns the number of bytes written to `out`, or -1 on bad arguments.
// Exactly one of (rgb) / (gray_in) must be non-null for the luma source;
// exactly one of (d16) / (dmeters) must be non-null for depth.
// Requirements (checked): H*W % 4 == 0 for gray_bits=6 (% 8 for 5);
// (H/s)*(W/s) even; stride >= 1; gray_bits in {5, 6, 8}.
int compact_yc12(const uint8_t* rgb, const uint8_t* gray_in,
                 const uint16_t* d16, const float* dmeters, int H, int W,
                 int stride, int gray_bits, int depth_bits, int chroma_mult,
                 uint8_t* out) {
  if ((rgb == nullptr) == (gray_in == nullptr)) return -1;
  if ((d16 == nullptr) == (dmeters == nullptr)) return -1;
  if (stride < 1 ||
      (gray_bits != 5 && gray_bits != 6 && gray_bits != 8))
    return -1;
  if (depth_bits != 10 && depth_bits != 12) return -1;
  if (chroma_mult != 2 && chroma_mult != 4) return -1;
  const int s = stride;
  const int hs = (H + s - 1) / s, ws = (W + s - 1) / s;
  if (gray_bits == 6 && (H * W) % 4 != 0) return -1;
  if (gray_bits == 5 && (H * W) % 8 != 0) return -1;
  if ((hs * ws) % (depth_bits == 10 ? 4 : 2) != 0) return -1;

  uint8_t* p = out;

  // ---- luma: RGB -> Y (+ dither + 5/6-bit pack), one pass ----------------
  if (gray_bits == 5) {
    // 8 consecutive pixels -> 5 bytes (little-endian bit stream), the quad
    // carried across row boundaries exactly like the flattened numpy
    // reshape; dither = Bayer>>1 (one 5-bit step) with the g>>5 decoder
    // bias cancellation (see manager._dither6(bits=5)/_pack5).
    uint8_t oct[8];
    int qn = 0;
    for (int y = 0; y < H; ++y) {
      const int* brow = kBayer5[y & 3];
      const uint8_t* rp = rgb ? rgb + static_cast<size_t>(y) * W * 3 : nullptr;
      const uint8_t* gp =
          gray_in ? gray_in + static_cast<size_t>(y) * W : nullptr;
      for (int x = 0; x < W; ++x) {
        int g8;
        if (rp) {
          const uint8_t* px = rp + 3 * x;
          g8 = (px[0] * 77 + px[1] * 150 + px[2] * 29) >> 8;
        } else {
          g8 = gp[x];
        }
        oct[qn++] = clip_u8(g8 + brow[x & 3] - (g8 >> 5)) >> 3;
        if (qn == 8) {
          p[0] = static_cast<uint8_t>(oct[0] | ((oct[1] & 0x07) << 5));
          p[1] = static_cast<uint8_t>((oct[1] >> 3) | (oct[2] << 2) |
                                      ((oct[3] & 0x01) << 7));
          p[2] = static_cast<uint8_t>((oct[3] >> 1) | ((oct[4] & 0x0F) << 4));
          p[3] = static_cast<uint8_t>((oct[4] >> 4) | (oct[5] << 1) |
                                      ((oct[6] & 0x03) << 6));
          p[4] = static_cast<uint8_t>((oct[6] >> 2) | (oct[7] << 3));
          p += 5;
          qn = 0;
        }
      }
    }
  } else if (gray_bits == 6) {
    // 4 consecutive pixels -> 3 bytes; W % 4 may be nonzero, so carry the
    // quad across row boundaries exactly like the flattened numpy reshape.
    uint8_t quad[4];
    int qn = 0;
    for (int y = 0; y < H; ++y) {
      const int* brow = kBayer6[y & 3];
      const uint8_t* rp = rgb ? rgb + static_cast<size_t>(y) * W * 3 : nullptr;
      const uint8_t* gp =
          gray_in ? gray_in + static_cast<size_t>(y) * W : nullptr;
      for (int x = 0; x < W; ++x) {
        int g8;
        if (rp) {
          const uint8_t* px = rp + 3 * x;
          g8 = (px[0] * 77 + px[1] * 150 + px[2] * 29) >> 8;
        } else {
          g8 = gp[x];
        }
        quad[qn++] =
            clip_u8(g8 + brow[x & 3] - (g8 >> 6)) >> 2;  // dither + quantize
        if (qn == 4) {
          p[0] = static_cast<uint8_t>(quad[0] | ((quad[1] & 0x03) << 6));
          p[1] = static_cast<uint8_t>((quad[1] >> 2) | ((quad[2] & 0x0F) << 4));
          p[2] = static_cast<uint8_t>((quad[2] >> 4) | (quad[3] << 2));
          p += 3;
          qn = 0;
        }
      }
    }
  } else {
    if (rgb) {
      for (int y = 0; y < H; ++y) {
        const uint8_t* rp = rgb + static_cast<size_t>(y) * W * 3;
        for (int x = 0; x < W; ++x) {
          const uint8_t* px = rp + 3 * x;
          p[x] = static_cast<uint8_t>((px[0] * 77 + px[1] * 150 + px[2] * 29) >>
                                      8);
        }
        p += W;
      }
    } else {
      std::memcpy(p, gray_in, static_cast<size_t>(H) * W);
      p += static_cast<size_t>(H) * W;
    }
  }

  // ---- depth + chroma tails (shared plane encoders) ----------------------
  p = encode_depth_plane(d16, dmeters, H, W, s, depth_bits, p);
  p = encode_chroma_planes(rgb, H, W, chroma_mult * s, p);
  return static_cast<int>(p - out);
}

// Fixed-rate 8x8 block-DCT luma wire (tpu_ingest_format=ydct) — the C twin
// of ops/dct_wire.py encode_luma_dct followed by the standard depth/chroma
// tails. The coded spec (bit_alloc / qstep / zigzag, k_coded positions) is
// passed in from Python so the format stays defined in ONE place
// (ops/dct_wire._SPEC). Output luma section: per-position bit planes, each
// byte-aligned (numpy packbits layout), MSB-first within a code.
//
// Near-exactness contract (tests/test_dct_wire.py): the DCT here
// accumulates in double against the same f32-rounded basis, so codes can
// differ from the numpy f32 GEMM encode by ±1 ulp-at-the-quantizer-edge in
// a ~1e-4 fraction of positions — both decode through the SAME canonical
// decoder within 1 gray level of each other. (The decoders, device and
// numpy, are bit-exact twins; encoders are near-exact by design, like two
// JPEG encoders sharing one decoder.)
int compact_ydct(const uint8_t* rgb, const uint8_t* gray_in,
                 const uint16_t* d16, const float* dmeters, int H, int W,
                 int stride, int depth_bits, int chroma_mult,
                 const int32_t* bit_alloc, const float* qstep,
                 const int32_t* zigzag, int k_coded, uint8_t* out) {
  if ((rgb == nullptr) == (gray_in == nullptr)) return -1;
  if ((d16 == nullptr) == (dmeters == nullptr)) return -1;
  if (stride < 1 || H % 8 != 0 || W % 8 != 0) return -1;
  if (depth_bits != 10 && depth_bits != 12) return -1;
  if (chroma_mult != 2 && chroma_mult != 4) return -1;
  if (k_coded < 1 || k_coded > 64) return -1;
  const int s = stride;
  const int hs = (H + s - 1) / s, ws = (W + s - 1) / s;
  if ((hs * ws) % (depth_bits == 10 ? 4 : 2) != 0) return -1;

  // f32-rounded orthonormal DCT-II basis (matches ops/dct_wire.DCT8)
  static float D[8][8];
  static bool d_init = false;
  if (!d_init) {
    for (int k = 0; k < 8; ++k)
      for (int n = 0; n < 8; ++n) {
        double v = std::cos(M_PI * (2 * n + 1) * k / 16.0) * std::sqrt(0.25);
        if (k == 0) v *= std::sqrt(0.5);
        D[k][n] = static_cast<float>(v);
      }
    d_init = true;
  }

  const int n_blocks = (H / 8) * (W / 8);
  // per-position bit-plane cursors (each plane byte-aligned like packbits)
  size_t plane_off[64];
  size_t luma_bytes = 0;
  for (int pp = 0; pp < k_coded; ++pp) {
    if (bit_alloc[pp] < 1 || bit_alloc[pp] > 16) return -1;
    plane_off[pp] = luma_bytes;
    luma_bytes +=
        (static_cast<size_t>(n_blocks) * bit_alloc[pp] + 7) / 8;
  }
  std::memset(out, 0, luma_bytes);

  const int bw = W / 8;
  double x[8][8], z[8][8];
  for (int blk = 0; blk < n_blocks; ++blk) {
    const int by = blk / bw, bx = blk % bw;
    // load the 8x8 luma block (RGB -> Y with the fixed-point formula)
    for (int i = 0; i < 8; ++i) {
      const int y = by * 8 + i;
      if (rgb) {
        const uint8_t* rp =
            rgb + (static_cast<size_t>(y) * W + bx * 8) * 3;
        for (int j = 0; j < 8; ++j) {
          const uint8_t* px = rp + 3 * j;
          x[i][j] = static_cast<double>(
              (px[0] * 77 + px[1] * 150 + px[2] * 29) >> 8);
        }
      } else {
        const uint8_t* gp = gray_in + static_cast<size_t>(y) * W + bx * 8;
        for (int j = 0; j < 8; ++j) x[i][j] = static_cast<double>(gp[j]);
      }
    }
    // separable DCT: Z = X @ D^T, Y = D @ Z (double accumulation)
    for (int i = 0; i < 8; ++i)
      for (int k = 0; k < 8; ++k) {
        double acc = 0.0;
        for (int j = 0; j < 8; ++j) acc += x[i][j] * D[k][j];
        z[i][k] = acc;
      }
    for (int pp = 0; pp < k_coded; ++pp) {
      const int idx = zigzag[pp];
      const int u = idx >> 3, v = idx & 7;
      double acc = 0.0;
      for (int i = 0; i < 8; ++i) acc += D[u][i] * z[i][v];
      const int b = bit_alloc[pp];
      const double sstep = static_cast<double>(qstep[pp]);
      long q = std::lround(std::nearbyint(acc / sstep));
      if (pp == 0) {
        const long hi = (1L << b) - 1;
        q = q < 0 ? 0 : (q > hi ? hi : q);
      } else {
        const long half = 1L << (b - 1);
        q = q < -half ? -half : (q > half - 1 ? half - 1 : q);
        q += half;
      }
      // write b bits MSB-first at bit position blk*b of plane pp:
      // place the code in a 24-bit window at [shift, shift+b) and OR the
      // three covered bytes (b <= 16, shift <= 7 -> always fits; trailing
      // OR-of-zero bytes may touch the next plane's zeroed prefix, which
      // is a no-op)
      const size_t bitpos = static_cast<size_t>(blk) * b;
      uint8_t* plane = out + plane_off[pp] + (bitpos >> 3);
      const uint32_t window = static_cast<uint32_t>(q)
                              << (24 - (bitpos & 7) - b);
      plane[0] |= static_cast<uint8_t>(window >> 16);
      plane[1] |= static_cast<uint8_t>(window >> 8);
      plane[2] |= static_cast<uint8_t>(window);
    }
  }
  uint8_t* p = out + luma_bytes;

  p = encode_depth_plane(d16, dmeters, H, W, s, depth_bits, p);
  p = encode_chroma_planes(rgb, H, W, chroma_mult * s, p);
  return static_cast<int>(p - out);
}

// Temporal-delta (P-frame) wire encoder — bit-exact twin of the numpy path
// in graph/manager.py delta_encode (closed-loop DPCM against the device's
// reconstructed wire codes; see _unpack_yc12_delta for the device decoder).
// Advances the prev_qg (H*W u8 luma codes) / prev_qd ((H/s)*(W/s) u16 depth
// codes) mirrors IN PLACE. Returns bytes written, -2 when more than
// clamp_budget residual samples clamped (caller ships an I-frame instead
// and rebuilds the mirrors from its codes — the partial in-place updates
// are overwritten), or -1 on bad arguments. gray_bits=6/depth_bits=10 only.
int compact_delta(const uint8_t* rgb, const uint8_t* gray_in,
                  const uint16_t* d16, const float* dmeters, uint8_t* prev_qg,
                  uint16_t* prev_qd, int H, int W, int stride,
                  int chroma_mult, int clamp_budget, uint8_t* out) {
  if ((rgb == nullptr) == (gray_in == nullptr)) return -1;
  if ((d16 == nullptr) == (dmeters == nullptr)) return -1;
  if (prev_qg == nullptr || prev_qd == nullptr) return -1;
  if (stride < 1 || (H * W) % 2 != 0) return -1;
  if (chroma_mult != 2 && chroma_mult != 4) return -1;
  const int s = stride;
  const int hs = (H + s - 1) / s, ws = (W + s - 1) / s;
  if ((hs * ws) % 8 != 0) return -1;

  uint8_t* p = out;
  long n_clamp = 0;

  // ---- luma residuals: q = dither6(Y) >> 2; r = clamp(q - prev, -8, 7);
  // two 4-bit codes (r + 8) per byte, low nibble first -------------------
  int pair = 0;
  int pn = 0;
  size_t gi = 0;
  for (int y = 0; y < H; ++y) {
    const int* brow = kBayer6[y & 3];
    const uint8_t* rp = rgb ? rgb + static_cast<size_t>(y) * W * 3 : nullptr;
    const uint8_t* gp =
        gray_in ? gray_in + static_cast<size_t>(y) * W : nullptr;
    for (int x = 0; x < W; ++x, ++gi) {
      int g8;
      if (rp) {
        const uint8_t* px = rp + 3 * x;
        g8 = (px[0] * 77 + px[1] * 150 + px[2] * 29) >> 8;
      } else {
        g8 = gp[x];
      }
      const int q = clip_u8(g8 + brow[x & 3] - (g8 >> 6)) >> 2;
      int r = q - prev_qg[gi];
      if (r < -8) {
        r = -8;
        ++n_clamp;
      } else if (r > 7) {
        r = 7;
        ++n_clamp;
      }
      prev_qg[gi] = static_cast<uint8_t>(prev_qg[gi] + r);
      if (pn == 0) {
        pair = r + 8;
        pn = 1;
      } else {
        *p++ = static_cast<uint8_t>(pair | ((r + 8) << 4));
        pn = 0;
      }
    }
  }
  if (n_clamp > clamp_budget) return -2;

  // ---- depth-code residuals: 5-bit (r + 16), 8 samples -> 5 B ----------
  const uint16_t* lut = d10_lut();
  uint8_t oct[8];
  int qn = 0;
  size_t di = 0;
  for (int y = 0; y < H; y += s) {
    const uint16_t* drow = d16 ? d16 + static_cast<size_t>(y) * W : nullptr;
    const float* frow =
        dmeters ? dmeters + static_cast<size_t>(y) * W : nullptr;
    for (int x = 0; x < W; x += s, ++di) {
      int r = static_cast<int>(lut[depth_sample(drow, frow, x)]) -
              static_cast<int>(prev_qd[di]);
      if (r < -16) {
        r = -16;
        ++n_clamp;
      } else if (r > 15) {
        r = 15;
        ++n_clamp;
      }
      prev_qd[di] = static_cast<uint16_t>(prev_qd[di] + r);
      oct[qn++] = static_cast<uint8_t>(r + 16);
      if (qn == 8) {
        p[0] = static_cast<uint8_t>(oct[0] | ((oct[1] & 0x07) << 5));
        p[1] = static_cast<uint8_t>((oct[1] >> 3) | (oct[2] << 2) |
                                    ((oct[3] & 0x01) << 7));
        p[2] = static_cast<uint8_t>((oct[3] >> 1) | ((oct[4] & 0x0F) << 4));
        p[3] = static_cast<uint8_t>((oct[4] >> 4) | (oct[5] << 1) |
                                    ((oct[6] & 0x03) << 6));
        p[4] = static_cast<uint8_t>((oct[6] >> 2) | (oct[7] << 3));
        p += 5;
        qn = 0;
      }
    }
  }
  if (n_clamp > clamp_budget) return -2;

  // ---- chroma tail: identical to the I-frame layout --------------------
  p = encode_chroma_planes(rgb, H, W, chroma_mult * s, p);
  return static_cast<int>(p - out);
}

}  // extern "C"
