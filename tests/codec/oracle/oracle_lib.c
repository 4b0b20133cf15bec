/* Generic ETSI-reference-binary oracle: load a PE, resolve any symbol,
 * call it with the Microsoft x64 ABI — driven from Python via ctypes.
 *
 * TEST TOOLING ONLY (see oracle_runner.c for background).  All ETSI
 * codec routines take at most four integer/pointer arguments and return
 * a Word16/Word32/void, so a single 4-slot trampoline covers the whole
 * codec surface:
 *
 *   void   *oracle_load(const char *exe_path);       NULL on failure
 *   uint64_t oracle_sym(void *pe, const char *name); 0 when absent
 *   int64_t  oracle_call4(uint64_t fn, int64_t a, int64_t b,
 *                         int64_t c, int64_t d);     ms_abi call
 *
 * Build: gcc -O2 -shared -fPIC -o liboracle.so oracle_lib.c
 */

#define _GNU_SOURCE
#include <fcntl.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

struct pe_image {
  uint8_t *file;
  size_t file_size;
  uint64_t image_base;
  uint32_t nsections;
  const uint8_t *sec_table;
  const uint8_t *symtab;
  uint32_t nsyms;
  const char *strtab;
};

static uint16_t rd16(const uint8_t *p) { uint16_t v; memcpy(&v, p, 2); return v; }
static uint32_t rd32(const uint8_t *p) { uint32_t v; memcpy(&v, p, 4); return v; }
static uint64_t rd64(const uint8_t *p) { uint64_t v; memcpy(&v, p, 8); return v; }

static int page_mapped(uint64_t addr) {
  unsigned char vec;
  return mincore((void *)addr, 1, &vec) == 0;
}

void *oracle_load(const char *path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return NULL;
  struct stat st;
  if (fstat(fd, &st) < 0) { close(fd); return NULL; }
  struct pe_image *pe = calloc(1, sizeof(*pe));
  pe->file_size = (size_t)st.st_size;
  pe->file = mmap(NULL, pe->file_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (pe->file == MAP_FAILED) { free(pe); return NULL; }
  if (rd16(pe->file) != 0x5A4D) return NULL;
  const uint8_t *nt = pe->file + rd32(pe->file + 0x3C);
  if (rd32(nt) != 0x00004550) return NULL;
  const uint8_t *coff = nt + 4;
  if (rd16(coff) != 0x8664) return NULL;
  pe->nsections = rd16(coff + 2);
  uint32_t symptr = rd32(coff + 8);
  pe->nsyms = rd32(coff + 12);
  uint16_t opt_size = rd16(coff + 16);
  const uint8_t *opt = coff + 20;
  if (rd16(opt) != 0x20B) return NULL;
  pe->image_base = rd64(opt + 24);
  pe->sec_table = opt + opt_size;
  pe->symtab = symptr ? pe->file + symptr : NULL;
  pe->strtab = pe->symtab ? (const char *)(pe->symtab + 18 * pe->nsyms)
                          : NULL;

  for (uint32_t i = 0; i < pe->nsections; ++i) {
    const uint8_t *s = pe->sec_table + 40 * i;
    uint32_t vsize = rd32(s + 8);
    uint32_t rva = rd32(s + 12);
    uint32_t rawsize = rd32(s + 16);
    uint32_t rawptr = rd32(s + 20);
    if (vsize == 0) continue;
    uint64_t start = (pe->image_base + rva) & ~0xFFFULL;
    uint64_t end = (pe->image_base + rva + vsize + 0xFFF) & ~0xFFFULL;
    void *m = mmap((void *)start, end - start,
                   PROT_READ | PROT_WRITE | PROT_EXEC,
                   MAP_PRIVATE | MAP_ANONYMOUS | MAP_FIXED_NOREPLACE,
                   -1, 0);
    if (m == MAP_FAILED && !page_mapped(start)) return NULL;
    if (rawptr && rawsize) {
      uint32_t n = rawsize < vsize ? rawsize : vsize;
      memcpy((void *)(pe->image_base + rva), pe->file + rawptr, n);
    }
  }
  return pe;
}

uint64_t oracle_sym(void *handle, const char *name) {
  struct pe_image *pe = handle;
  if (!pe || !pe->symtab) return 0;
  for (uint32_t i = 0; i < pe->nsyms; ++i) {
    const uint8_t *sym = pe->symtab + 18 * i;
    char buf[9] = {0};
    const char *sname;
    if (rd32(sym) == 0) {
      sname = pe->strtab + rd32(sym + 4);
    } else {
      memcpy(buf, sym, 8);
      sname = buf;
    }
    int16_t secnum = (int16_t)rd16(sym + 12);
    if (secnum > 0 && strcmp(sname, name) == 0) {
      const uint8_t *s = pe->sec_table + 40 * (secnum - 1);
      return pe->image_base + rd32(s + 12) + rd32(sym + 8);
    }
    i += sym[17];
  }
  return 0;
}

typedef int64_t (*ms_fn4)(int64_t, int64_t, int64_t, int64_t)
    __attribute__((ms_abi));

int64_t oracle_call4(uint64_t fn, int64_t a, int64_t b, int64_t c,
                     int64_t d) {
  return ((ms_fn4)fn)(a, b, c, d);
}
