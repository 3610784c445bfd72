/* Reconstruction of the public-domain ryg_rans 64-bit rANS API
 * (Fabian "ryg" Giesen, https://github.com/rygorous/ryg_rans, rans64.h),
 * written from the published algorithm description so the reference
 * project's `rans_interface.cpp` (which #includes <rans64.h>, normally
 * fetched from GitHub at CMake time — impossible here, zero egress) can be
 * compiled as a TEST FIXTURE for cross-codec bitstream interop tests.
 *
 * Semantics (these define the stream format, so they are spelled out):
 *  - State is a uint64; normalized interval is [RANS64_L, RANS64_L * 2^32)
 *    with RANS64_L = 1 << 31.
 *  - The stream is a sequence of uint32 words. The ENCODER writes
 *    backward (predecrement) and renormalizes by emitting the low 32 bits
 *    of the state when x >= ((RANS64_L >> scale_bits) << 32) * freq.
 *  - Encoding step: x' = floor(x / freq) << scale_bits + (x % freq) + start.
 *  - Flush emits the final 64-bit state as two uint32 words, low word
 *    first in memory.
 *  - The DECODER reads forward: init consumes two words (low, high),
 *    DecGet peeks the low scale_bits of the state, DecAdvance applies
 *    x' = freq * (x >> scale_bits) + (x & mask) - start and refills one
 *    word when x' < RANS64_L.
 *
 * This is a test-support header only; the framework's own coder lives in
 * vcm_ts_tpu/entropy/native/rans.cpp and shares no code with this file.
 */

#pragma once

#include <cassert>
#include <cstdint>

#define Rans64Assert assert

typedef uint64_t Rans64State;

#define RANS64_L (1ull << 31)

static inline void Rans64EncInit(Rans64State *r) { *r = RANS64_L; }

static inline void Rans64EncPut(Rans64State *r, uint32_t **pptr,
                                uint32_t start, uint32_t freq,
                                uint32_t scale_bits) {
  Rans64Assert(freq != 0);

  /* renormalize (never needs to loop) */
  uint64_t x = *r;
  uint64_t x_max = ((RANS64_L >> scale_bits) << 32) * freq;
  if (x >= x_max) {
    *pptr -= 1;
    **pptr = (uint32_t)x;
    x >>= 32;
  }

  /* x = C(s, x) */
  *r = ((x / freq) << scale_bits) + (x % freq) + start;
}

static inline void Rans64EncFlush(Rans64State *r, uint32_t **pptr) {
  uint64_t x = *r;
  uint32_t *ptr = *pptr;

  ptr -= 2;
  ptr[0] = (uint32_t)(x >> 0);
  ptr[1] = (uint32_t)(x >> 32);

  *pptr = ptr;
}

static inline void Rans64DecInit(Rans64State *r, uint32_t **pptr) {
  uint64_t x;
  uint32_t *ptr = *pptr;

  x = (uint64_t)ptr[0] << 0;
  x |= (uint64_t)ptr[1] << 32;
  ptr += 2;

  *pptr = ptr;
  *r = x;
}

static inline uint32_t Rans64DecGet(Rans64State *r, uint32_t scale_bits) {
  return (uint32_t)(*r & ((1ull << scale_bits) - 1));
}

static inline void Rans64DecAdvance(Rans64State *r, uint32_t **pptr,
                                    uint32_t start, uint32_t freq,
                                    uint32_t scale_bits) {
  uint64_t mask = (1ull << scale_bits) - 1;

  uint64_t x = *r;
  x = freq * (x >> scale_bits) + (x & mask) - start;

  /* renormalize */
  if (x < RANS64_L) {
    x = (x << 32) | **pptr;
    *pptr += 1;
    Rans64Assert(x >= RANS64_L);
  }

  *r = x;
}
