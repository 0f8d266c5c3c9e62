// blosc1-format codec (zstd + byte shuffle) for HDF5 voxel caches.
//
// The reference framework stores voxel-grid caches as blosc-zstd HDF5
// chunks (filter id 32001, complevel 1, byte shuffle). This TU implements
// enough of the c-blosc1 container format to read and write those chunks
// without libblosc: 16-byte header, per-block bstarts table, one zstd
// stream per block (c-blosc does not split blocks for zstd), byte
// shuffle/unshuffle at block granularity, and the memcpy/raw-stream
// fallbacks.
//
// Format reference: c-blosc README_CHUNK_FORMAT.rst (BSD licensed spec).
//
// Build: g++ -O3 -shared -fPIC blosc_codec.cpp -o libbflow_blosc.so -lzstd

#include <cstdint>
#include <cstring>
#include <vector>

#include <zstd.h>

namespace {

constexpr uint8_t kFlagByteShuffle = 0x1;
constexpr uint8_t kFlagMemcpy = 0x2;
constexpr int kCodecZstd = 4;  // flags >> 5

uint32_t read_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/ARM LE)
}

void write_u32(uint8_t* p, uint32_t v) { std::memcpy(p, &v, 4); }

// Scatter bytes of each element across the block: out[b * n + i] holds
// byte b of element i (n = elements in block).
void shuffle_bytes(const uint8_t* src, uint8_t* dst, size_t nbytes,
                   size_t typesize) {
  const size_t n = nbytes / typesize;
  for (size_t b = 0; b < typesize; ++b) {
    const uint8_t* s = src + b;
    uint8_t* d = dst + b * n;
    for (size_t i = 0; i < n; ++i) d[i] = s[i * typesize];
  }
  // trailing bytes (nbytes not divisible by typesize) copied verbatim
  std::memcpy(dst + n * typesize, src + n * typesize, nbytes - n * typesize);
}

void unshuffle_bytes(const uint8_t* src, uint8_t* dst, size_t nbytes,
                     size_t typesize) {
  const size_t n = nbytes / typesize;
  for (size_t b = 0; b < typesize; ++b) {
    const uint8_t* s = src + b * n;
    uint8_t* d = dst + b;
    for (size_t i = 0; i < n; ++i) d[i * typesize] = s[i];
  }
  std::memcpy(dst + n * typesize, src + n * typesize, nbytes - n * typesize);
}

}  // namespace

extern "C" {

// Decompress a blosc1 chunk. Returns decompressed byte count, or -1 on
// malformed input / unsupported codec / insufficient dst capacity.
long bflow_blosc_decompress(const uint8_t* src, long srclen, uint8_t* dst,
                            long dstcap) {
  if (srclen < 16) return -1;
  const uint8_t flags = src[2];
  const uint32_t typesize = src[3];
  const uint32_t nbytes = read_u32(src + 4);
  const uint32_t blocksize = read_u32(src + 8);
  const uint32_t cbytes = read_u32(src + 12);
  if (cbytes > (uint32_t)srclen || nbytes > (uint32_t)dstcap) return -1;

  if (flags & kFlagMemcpy) {
    // c-blosc1 memcpys the ORIGINAL (unshuffled) buffer when compression
    // doesn't pay; the shuffle flag may still be set and must be ignored.
    if (srclen < (long)(16 + nbytes)) return -1;
    std::memcpy(dst, src + 16, nbytes);
    return (long)nbytes;
  }

  const int codec = flags >> 5;
  if (codec != kCodecZstd) return -1;  // zstd caches only
  if (blocksize == 0) return -1;

  const uint32_t nblocks = (nbytes + blocksize - 1) / blocksize;
  if (srclen < (long)(16 + 4ul * nblocks)) return -1;

  std::vector<uint8_t> tmp(blocksize);
  for (uint32_t blk = 0; blk < nblocks; ++blk) {
    const uint32_t bstart = read_u32(src + 16 + 4 * blk);
    const uint32_t out_off = blk * blocksize;
    const uint32_t neblock =
        (blk == nblocks - 1) ? (nbytes - out_off) : blocksize;
    if (bstart + 4 > (uint32_t)srclen) return -1;
    const uint32_t csize = read_u32(src + bstart);
    if (bstart + 4 + csize > (uint32_t)srclen) return -1;

    uint8_t* blk_dst = (flags & kFlagByteShuffle) ? tmp.data() : dst + out_off;
    if (csize == neblock) {
      // stored raw (compression did not reduce this block)
      std::memcpy(blk_dst, src + bstart + 4, neblock);
    } else {
      const size_t got = ZSTD_decompress(blk_dst, neblock,
                                         src + bstart + 4, csize);
      if (ZSTD_isError(got) || got != neblock) return -1;
    }
    if (flags & kFlagByteShuffle) {
      unshuffle_bytes(tmp.data(), dst + out_off, neblock,
                      typesize > 1 ? typesize : 1);
    }
  }
  return (long)nbytes;
}

// Compress into blosc1 format (zstd, byte shuffle). Returns total chunk
// bytes written, or -1 if dst is too small / inputs invalid.
long bflow_blosc_compress(const uint8_t* src, long nbytes_l, uint8_t* dst,
                          long dstcap, int typesize, int clevel) {
  if (nbytes_l <= 0 || typesize <= 0) return -1;
  const uint32_t nbytes = (uint32_t)nbytes_l;
  uint32_t blocksize = 256 * 1024;
  if (blocksize > nbytes) blocksize = nbytes;
  blocksize -= blocksize % (uint32_t)typesize;
  if (blocksize == 0) blocksize = nbytes;

  const uint32_t nblocks = (nbytes + blocksize - 1) / blocksize;
  uint32_t pos = 16 + 4 * nblocks;
  if ((long)pos > dstcap) return -1;

  dst[0] = 2;  // format version
  dst[1] = 1;
  dst[2] = kFlagByteShuffle | (kCodecZstd << 5);
  dst[3] = (uint8_t)typesize;
  write_u32(dst + 4, nbytes);
  write_u32(dst + 8, blocksize);

  std::vector<uint8_t> shuffled(blocksize);
  for (uint32_t blk = 0; blk < nblocks; ++blk) {
    const uint32_t off = blk * blocksize;
    const uint32_t neblock =
        (blk == nblocks - 1) ? (nbytes - off) : blocksize;
    shuffle_bytes(src + off, shuffled.data(), neblock, (size_t)typesize);

    write_u32(dst + 16 + 4 * blk, pos);  // bstart
    if ((long)(pos + 4) > dstcap) return -1;
    const size_t cap = (size_t)(dstcap - pos - 4);
    size_t csize = ZSTD_compress(dst + pos + 4, cap, shuffled.data(),
                                 neblock, clevel);
    if (ZSTD_isError(csize) || csize >= neblock) {
      // store raw; csize == neblock signals an uncompressed stream
      if (cap < neblock) return -1;
      std::memcpy(dst + pos + 4, shuffled.data(), neblock);
      csize = neblock;
    }
    write_u32(dst + pos, (uint32_t)csize);
    pos += 4 + (uint32_t)csize;
  }
  write_u32(dst + 12, pos);  // cbytes
  return (long)pos;
}

}  // extern "C"
