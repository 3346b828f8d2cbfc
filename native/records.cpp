// Memory-mapped training-record store — native IO for the data pipeline.
//
// Replaces the reference's pickle-per-sample replay dataset
// (dataset.py:341-364: 120k pkl files read through DataLoader worker
// processes) with a single mmap'd container: O(1) random record access with
// zero parsing and no copies until the caller asks for one.
//
// Layout (little-endian):
//   magic[8] = "CPPF2REC"
//   u64 n_records, u64 n_fields, u64 record_stride_bytes
//   per field: char name[32], u32 dtype (0=f32, 1=i32), u32 ndim,
//              u64 shape[4], u64 offset_in_record
//   data: n_records x record_stride_bytes, fields at their offsets.

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct FieldDesc {
  char name[32];
  uint32_t dtype;
  uint32_t ndim;
  uint64_t shape[4];
  uint64_t offset;
};

struct Reader {
  int fd = -1;
  uint8_t* base = nullptr;
  size_t size = 0;
  uint64_t n_records = 0;
  uint64_t n_fields = 0;
  uint64_t stride = 0;
  const FieldDesc* fields = nullptr;
  const uint8_t* data = nullptr;
};

}  // namespace

extern "C" {

void* rec_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  void* base = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (base == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* r = new Reader();
  r->fd = fd;
  r->base = static_cast<uint8_t*>(base);
  r->size = st.st_size;
  if (r->size < 32 || memcmp(r->base, "CPPF2REC", 8) != 0) {
    munmap(base, st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  memcpy(&r->n_records, r->base + 8, 8);
  memcpy(&r->n_fields, r->base + 16, 8);
  memcpy(&r->stride, r->base + 24, 8);
  r->fields = reinterpret_cast<const FieldDesc*>(r->base + 32);
  r->data = r->base + 32 + r->n_fields * sizeof(FieldDesc);
  if (r->stride > 0) {
    // the file size is the authoritative record count: it recovers the tail
    // a crashed writer appended after its last header patch, and clamps
    // safely if the file was truncated (the header count is only patched
    // periodically + on close)
    size_t data_start = 32 + r->n_fields * sizeof(FieldDesc);
    r->n_records =
        r->size > data_start ? (r->size - data_start) / r->stride : 0;
  }
  return r;
}

void rec_close(void* h) {
  auto* r = static_cast<Reader*>(h);
  if (!r) return;
  munmap(r->base, r->size);
  ::close(r->fd);
  delete r;
}

uint64_t rec_count(void* h) { return static_cast<Reader*>(h)->n_records; }
uint64_t rec_field_count(void* h) { return static_cast<Reader*>(h)->n_fields; }

const char* rec_field_name(void* h, uint64_t f) {
  return static_cast<Reader*>(h)->fields[f].name;
}
uint32_t rec_field_dtype(void* h, uint64_t f) {
  return static_cast<Reader*>(h)->fields[f].dtype;
}
uint32_t rec_field_ndim(void* h, uint64_t f) {
  return static_cast<Reader*>(h)->fields[f].ndim;
}
void rec_field_shape(void* h, uint64_t f, uint64_t* out4) {
  memcpy(out4, static_cast<Reader*>(h)->fields[f].shape, 4 * sizeof(uint64_t));
}

// Pointer to a field of a record inside the map (zero copy).
const void* rec_field_ptr(void* h, uint64_t record, uint64_t f) {
  auto* r = static_cast<Reader*>(h);
  if (record >= r->n_records || f >= r->n_fields) return nullptr;
  return r->data + record * r->stride + r->fields[f].offset;
}

// Gather one field of many records into a contiguous buffer (batch assembly).
void rec_gather(void* h, const int64_t* record_ids, int64_t n, uint64_t f,
                void* dst) {
  auto* r = static_cast<Reader*>(h);
  const FieldDesc& fd = r->fields[f];
  uint64_t bytes = (fd.dtype == 0 || fd.dtype == 1) ? 4 : 8;
  for (uint32_t d = 0; d < fd.ndim; ++d) bytes *= fd.shape[d];
  auto* out = static_cast<uint8_t*>(dst);
  for (int64_t i = 0; i < n; ++i) {
    memcpy(out + i * bytes, r->data + record_ids[i] * r->stride + fd.offset,
           bytes);
  }
}

}  // extern "C"
