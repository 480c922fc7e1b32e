// Native frame codec: host-side WIBEth framing at streaming rates.
//
// The ingest path must sustain multi-GB/s host-side framing (SURVEY.md §7
// hard part (d)); numpy's per-channel Python loop tops out well below a
// production link aggregate.  These kernels are written as flat loops over
// 64-channel rows so the compiler auto-vectorizes them; they are the C++
// analogue of the reference's expand_wibeth_adcs (FrameExpand.hpp:192-246)
// in natural channel order.
//
// Layout contract (formats/wibeth.py): frame = 7200 B, 4 x u64 header
// words, ADC rows of 14 u64 words (64 ch x 14 bit, little-endian).

#include <cstdint>
#include <cstring>

namespace {
constexpr int kFrameBytes = 7200;
constexpr int kHeaderBytes = 32;
constexpr int kRowBytes = 112;  // 64 * 14 / 8
constexpr int kRows = 64;
constexpr int kChannels = 64;
}  // namespace

extern "C" {

// Unpack n_frames WIBEth frames -> out[n_frames*64][64] uint16 ADCs.
void wibeth_unpack(const uint8_t* frames, uint64_t n_frames, uint16_t* out) {
  for (uint64_t f = 0; f < n_frames; ++f) {
    const uint8_t* base = frames + f * kFrameBytes + kHeaderBytes;
    uint16_t* orow = out + f * kRows * kChannels;
    for (int t = 0; t < kRows; ++t) {
      const uint8_t* row = base + t * kRowBytes;
      uint16_t* o = orow + t * kChannels;
      for (int c = 0; c < kChannels; ++c) {
        int bit = c * 14;
        int byte = bit >> 3;
        int sh = bit & 7;
        uint32_t v;
        std::memcpy(&v, row + byte, sizeof(v));  // little-endian
        o[c] = static_cast<uint16_t>((v >> sh) & 0x3FFF);
      }
    }
  }
}

// Pack adcs[n_frames*64][64] uint16 -> frames' ADC regions (headers kept).
void wibeth_pack(uint8_t* frames, uint64_t n_frames, const uint16_t* adcs) {
  for (uint64_t f = 0; f < n_frames; ++f) {
    uint8_t* base = frames + f * kFrameBytes + kHeaderBytes;
    const uint16_t* irow = adcs + f * kRows * kChannels;
    for (int t = 0; t < kRows; ++t) {
      uint8_t* row = base + t * kRowBytes;
      std::memset(row, 0, kRowBytes);
      const uint16_t* in = irow + t * kChannels;
      for (int c = 0; c < kChannels; ++c) {
        int bit = c * 14;
        int byte = bit >> 3;
        int sh = bit & 7;
        uint32_t v;
        std::memcpy(&v, row + byte, sizeof(v));
        v |= (static_cast<uint32_t>(in[c] & 0x3FFF)) << sh;
        std::memcpy(row + byte, &v, sizeof(v));
      }
    }
  }
}

// Extract the 64-bit timestamps (header word 1) of n frames.
void wibeth_timestamps(const uint8_t* frames, uint64_t n_frames,
                       uint64_t* out) {
  for (uint64_t f = 0; f < n_frames; ++f) {
    std::memcpy(&out[f], frames + f * kFrameBytes + 8, sizeof(uint64_t));
  }
}

// Set perfectly incrementing timestamps + sequence ids (emulator repair).
void wibeth_fake_headers(uint8_t* frames, uint64_t n_frames, uint64_t first_ts,
                         uint64_t tick, uint64_t first_seq) {
  for (uint64_t f = 0; f < n_frames; ++f) {
    uint8_t* hdr = frames + f * kFrameBytes;
    uint64_t ts = first_ts + f * tick;
    std::memcpy(hdr + 8, &ts, sizeof(ts));
    uint64_t w0;
    std::memcpy(&w0, hdr, sizeof(w0));
    uint64_t seq = (first_seq + f) & 0xFFFULL;
    w0 = (w0 & ~(0xFFFULL << 40)) | (seq << 40);
    std::memcpy(hdr, &w0, sizeof(w0));
  }
}

}  // extern "C"
