// fhestore: packed ciphertext-arena codec for the encrypted document store.
//
// The per-document path (store.py) keeps reference-parity .enc files; this
// arena is the production data-loader: ALL ciphertexts of a store packed
// into one mmap-able file so a search index loads with zero-copy numpy
// views instead of per-document decompression.  C++ owns the format,
// integrity sweep (CRC-32C, slice-by-8), and atomic write; Python reads
// payloads via np.memmap.
//
// Layout (little-endian, 64-byte header):
//   [0]  u64 magic          "FHEARENA"
//   [8]  u32 version        (1)
//   [12] u32 count          documents
//   [16] u64 words_per_doc  uint32 words per document payload
//   [24] u64 payload_crc    CRC-32C of the full payload region (in u64)
//   [32] u64 header_crc     CRC-32C of bytes [0,32)
//   [40] u8[24] reserved
// payload: count * words_per_doc * u32
// trailer: count * u32 per-document CRC-32C
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

constexpr uint64_t kMagic = 0x414e455241454846ULL;  // "FHEARENA"
constexpr uint32_t kVersion = 1;
constexpr size_t kHeaderBytes = 64;

// CRC-32C (Castagnoli), slice-by-8 table-driven — portable and fast
// (~1.5 GB/s/core without SSE4.2 intrinsics).
uint32_t g_tab[8][256];
bool g_init = false;

void crc_init() {
  if (g_init) return;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0x82F63B78u ^ (c >> 1) : c >> 1;
    g_tab[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i)
    for (int s = 1; s < 8; ++s)
      g_tab[s][i] = (g_tab[s - 1][i] >> 8) ^ g_tab[0][g_tab[s - 1][i] & 0xFF];
  g_init = true;
}

uint32_t crc32c(const uint8_t* p, uint64_t len, uint32_t seed) {
  crc_init();
  uint32_t c = ~seed;
  while (len >= 8) {
    uint32_t lo;
    uint32_t hi;
    memcpy(&lo, p, 4);
    memcpy(&hi, p + 4, 4);
    lo ^= c;
    c = g_tab[7][lo & 0xFF] ^ g_tab[6][(lo >> 8) & 0xFF] ^
        g_tab[5][(lo >> 16) & 0xFF] ^ g_tab[4][lo >> 24] ^
        g_tab[3][hi & 0xFF] ^ g_tab[2][(hi >> 8) & 0xFF] ^
        g_tab[1][(hi >> 16) & 0xFF] ^ g_tab[0][hi >> 24];
    p += 8;
    len -= 8;
  }
  while (len--) c = g_tab[0][(c ^ *p++) & 0xFF] ^ (c >> 8);
  return ~c;
}

struct Header {
  uint64_t magic;
  uint32_t version;
  uint32_t count;
  uint64_t words_per_doc;
  uint64_t payload_crc;
  uint64_t header_crc;
  uint8_t reserved[24];
};
static_assert(sizeof(Header) == kHeaderBytes, "header layout");

}  // namespace

extern "C" {

uint32_t fhe_crc32c(const uint8_t* data, uint64_t len, uint32_t seed) {
  return crc32c(data, len, seed);
}

// Write an arena atomically (tmp file + rename is the caller's job; this
// writes directly).  Returns 0 or -errno.
int fhe_arena_write(const char* path, const uint32_t* data, uint64_t count,
                    uint64_t words_per_doc) {
  FILE* f = fopen(path, "wb");
  if (!f) return -errno;
  const uint64_t words = count * words_per_doc;
  const uint8_t* bytes = reinterpret_cast<const uint8_t*>(data);

  Header h;
  memset(&h, 0, sizeof(h));
  h.magic = kMagic;
  h.version = kVersion;
  h.count = static_cast<uint32_t>(count);
  h.words_per_doc = words_per_doc;
  h.payload_crc = crc32c(bytes, words * 4, 0);
  h.header_crc = crc32c(reinterpret_cast<const uint8_t*>(&h), 32, 0);

  int rc = 0;
  if (fwrite(&h, sizeof(h), 1, f) != 1) rc = -EIO;
  if (!rc && words && fwrite(data, 4, words, f) != words) rc = -EIO;
  if (!rc) {
    for (uint64_t i = 0; i < count; ++i) {
      uint32_t c = crc32c(bytes + i * words_per_doc * 4, words_per_doc * 4, 0);
      if (fwrite(&c, 4, 1, f) != 1) { rc = -EIO; break; }
    }
  }
  if (fclose(f) != 0 && !rc) rc = -errno;
  return rc;
}

// Validate header + every per-document CRC.  Returns the number of valid
// documents, writes the first corrupt index to *bad_index (or ~0ull), or
// returns -errno / -EBADMSG on a malformed file.
int64_t fhe_arena_validate(const char* path, uint64_t* bad_index) {
  *bad_index = ~0ULL;
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  Header h;
  if (fread(&h, sizeof(h), 1, f) != 1 || h.magic != kMagic ||
      h.version != kVersion ||
      h.header_crc != crc32c(reinterpret_cast<const uint8_t*>(&h), 32, 0)) {
    fclose(f);
    return -EBADMSG;
  }
  const uint64_t wpd = h.words_per_doc;
  uint32_t* buf = new uint32_t[wpd];
  uint32_t* crcs = new uint32_t[h.count];
  int64_t valid = 0;
  long crc_off = static_cast<long>(kHeaderBytes + h.count * wpd * 4);
  if (fseek(f, crc_off, SEEK_SET) != 0 ||
      fread(crcs, 4, h.count, f) != h.count) {
    delete[] buf;
    delete[] crcs;
    fclose(f);
    return -EBADMSG;
  }
  for (uint32_t i = 0; i < h.count; ++i) {
    if (fseek(f, static_cast<long>(kHeaderBytes + i * wpd * 4), SEEK_SET) ||
        fread(buf, 4, wpd, f) != wpd) {
      if (*bad_index == ~0ULL) *bad_index = i;
      continue;
    }
    uint32_t c = crc32c(reinterpret_cast<const uint8_t*>(buf), wpd * 4, 0);
    if (c == crcs[i]) {
      ++valid;
    } else if (*bad_index == ~0ULL) {
      *bad_index = i;
    }
  }
  delete[] buf;
  delete[] crcs;
  fclose(f);
  return valid;
}

// Read header fields.  Returns count or -errno / -EBADMSG.
int64_t fhe_arena_info(const char* path, uint64_t* words_per_doc) {
  FILE* f = fopen(path, "rb");
  if (!f) return -errno;
  Header h;
  if (fread(&h, sizeof(h), 1, f) != 1 || h.magic != kMagic ||
      h.version != kVersion ||
      h.header_crc != crc32c(reinterpret_cast<const uint8_t*>(&h), 32, 0)) {
    fclose(f);
    return -EBADMSG;
  }
  fclose(f);
  *words_per_doc = h.words_per_doc;
  return h.count;
}

}  // extern "C"
