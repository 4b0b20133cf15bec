/* Test oracle: run the ETSI reference channel-codec functions from the
 * upstream Windows binaries natively on Linux.
 *
 * The reference app ships the ETSI EN 300 395-2 channel codec only as
 * MinGW-built x86-64 PE executables (tetraear/tetra_codec/bin).  Their
 * codec routines are plain C functions (no imports, no CRT state), so
 * this harness maps the PE sections at the image base, resolves the
 * function symbols from the COFF symbol table and calls them with the
 * Microsoft x64 calling convention (__attribute__((ms_abi))) — giving
 * the test suite a true bit-exactness oracle for our reimplementation
 * without Wine or Windows.
 *
 * TEST TOOLING ONLY: not part of the shipped framework.
 *
 * Usage: oracle_runner <exe> <mode>
 *   mode "encode":  stdin = 274 int16 bits (frame A then frame B)
 *                   stdout = 432 int16 soft bits (interleaved slot)
 *   mode "encode_fs": stdin = 137 int16 bits -> stdout 216 int16
 *   mode "decode":  stdin = 432 int16 soft -> stdout = BFI + 274 int16
 * Exit 0 on success.
 */

#define _GNU_SOURCE
#include <fcntl.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

typedef int16_t Word16;

/* ---- minimal PE64 mapping -------------------------------------------- */

struct pe_image {
  uint8_t *file;            /* raw file bytes */
  size_t file_size;
  uint64_t image_base;
  uint32_t nsections;
  const uint8_t *sec_table; /* section headers (40 bytes each) */
  const uint8_t *symtab;    /* COFF symbols (18 bytes each) */
  uint32_t nsyms;
  const char *strtab;       /* COFF string table */
};

static uint16_t rd16(const uint8_t *p) { uint16_t v; memcpy(&v, p, 2); return v; }
static uint32_t rd32(const uint8_t *p) { uint32_t v; memcpy(&v, p, 4); return v; }
static uint64_t rd64(const uint8_t *p) { uint64_t v; memcpy(&v, p, 8); return v; }

static int pe_open(const char *path, struct pe_image *pe) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) < 0) { close(fd); return -1; }
  pe->file_size = (size_t)st.st_size;
  pe->file = mmap(NULL, pe->file_size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (pe->file == MAP_FAILED) return -1;
  if (rd16(pe->file) != 0x5A4D) return -2;                 /* MZ */
  uint32_t e_lfanew = rd32(pe->file + 0x3C);
  const uint8_t *nt = pe->file + e_lfanew;
  if (rd32(nt) != 0x00004550) return -3;                   /* PE\0\0 */
  const uint8_t *coff = nt + 4;
  uint16_t machine = rd16(coff);
  if (machine != 0x8664) return -4;                        /* x86-64 only */
  pe->nsections = rd16(coff + 2);
  uint32_t symptr = rd32(coff + 8);
  pe->nsyms = rd32(coff + 12);
  uint16_t opt_size = rd16(coff + 16);
  const uint8_t *opt = coff + 20;
  if (rd16(opt) != 0x20B) return -5;                       /* PE32+ */
  pe->image_base = rd64(opt + 24);
  pe->sec_table = opt + opt_size;
  pe->symtab = symptr ? pe->file + symptr : NULL;
  pe->strtab = pe->symtab ? (const char *)(pe->symtab + 18 * pe->nsyms)
                          : NULL;
  return 0;
}

/* crude check: was the page already mapped by a previous section? */
static int errno_page_mapped(uint64_t addr) {
  unsigned char vec;
  return mincore((void *)addr, 1, &vec) == 0;
}

static int pe_map(const struct pe_image *pe) {
  for (uint32_t i = 0; i < pe->nsections; ++i) {
    const uint8_t *s = pe->sec_table + 40 * i;
    uint32_t vsize = rd32(s + 8);
    uint32_t rva = rd32(s + 12);
    uint32_t rawsize = rd32(s + 16);
    uint32_t rawptr = rd32(s + 20);
    if (vsize == 0) continue;
    uint64_t start = (pe->image_base + rva) & ~0xFFFULL;
    uint64_t end = (pe->image_base + rva + vsize + 0xFFF) & ~0xFFFULL;
    /* MAP_FIXED is safe here: the 0x140000000 region is far from any
     * loader mapping, and overlapping PE sections share pages. */
    void *m = mmap((void *)start, end - start,
                   PROT_READ | PROT_WRITE | PROT_EXEC,
                   MAP_PRIVATE | MAP_ANONYMOUS | MAP_FIXED_NOREPLACE, -1, 0);
    if (m == MAP_FAILED && errno_page_mapped(start)) m = (void *)start;
    if (m == MAP_FAILED) return -1;
    if (rawptr && rawsize) {
      uint32_t n = rawsize < vsize ? rawsize : vsize;
      memcpy((void *)(pe->image_base + rva), pe->file + rawptr, n);
    }
  }
  return 0;
}

static uint64_t pe_sym(const struct pe_image *pe, const char *name) {
  if (!pe->symtab) return 0;
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
    i += sym[17];                       /* skip aux symbols */
  }
  return 0;
}

/* ---- reference function signatures (MS x64 ABI) ----------------------- */

typedef Word16 (*enc_fn)(Word16 first_pass, Word16 fs, Word16 *in,
                         Word16 *out) __attribute__((ms_abi));
typedef Word16 (*dec_fn)(Word16 first_pass, Word16 fs, Word16 *in,
                         Word16 *out) __attribute__((ms_abi));
typedef Word16 (*ilv_fn)(Word16 *in, Word16 *out) __attribute__((ms_abi));

static int read_words(Word16 *buf, int n) {
  return fread(buf, sizeof(Word16), n, stdin) == (size_t)n ? 0 : -1;
}

int main(int argc, char **argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: %s <exe> encode|encode_fs|decode\n", argv[0]);
    return 2;
  }
  struct pe_image pe;
  int rc = pe_open(argv[1], &pe);
  if (rc) { fprintf(stderr, "pe_open: %d\n", rc); return 3; }
  if (pe_map(&pe)) { fprintf(stderr, "pe_map failed\n"); return 4; }

  const char *mode = argv[2];
  if (strcmp(mode, "encode") == 0 || strcmp(mode, "encode_fs") == 0) {
    enc_fn channel_encoding = (enc_fn)pe_sym(&pe, "Channel_Encoding");
    ilv_fn interleave = (ilv_fn)pe_sym(&pe, strcmp(mode, "encode") == 0
                                                ? "Interleaving_Speech"
                                                : "Interleaving_Signalling");
    if (!channel_encoding || !interleave) {
      fprintf(stderr, "symbols not found\n");
      return 5;
    }
    int fs = strcmp(mode, "encode_fs") == 0;
    int nin = fs ? 137 : 274;
    int nout = fs ? 216 : 432;
    Word16 in[274] = {0}, coded[432] = {0}, out[432] = {0};
    if (read_words(in, nin)) return 6;
    Word16 *input = in;
    Word16 *coded_at = coded;
    if (fs) {
      /* reference encodes the stolen frame from input+137 into
       * output+216; replicate that call shape */
      static Word16 in2[274], coded2[432];
      memcpy(in2 + 137, in, sizeof(Word16) * 137);
      input = in2;
      coded_at = coded2;
    }
    channel_encoding(1, (Word16)fs, input, coded_at);
    interleave(fs ? coded_at + 216 : coded_at, out);
    fwrite(out, sizeof(Word16), nout, stdout);
    return 0;
  }
  if (strcmp(mode, "decode") == 0) {
    dec_fn channel_decoding = (dec_fn)pe_sym(&pe, "Channel_Decoding");
    ilv_fn deinterleave = (ilv_fn)pe_sym(&pe, "Desinterleaving_Speech");
    if (!channel_decoding || !deinterleave) {
      fprintf(stderr, "symbols not found\n");
      return 5;
    }
    Word16 soft[432], de[432] = {0}, out[274] = {0};
    if (read_words(soft, 432)) return 6;
    deinterleave(soft, de);
    Word16 bfi = channel_decoding(1, 0, de, out);
    fwrite(&bfi, sizeof(Word16), 1, stdout);
    fwrite(out, sizeof(Word16), 274, stdout);
    return 0;
  }
  fprintf(stderr, "unknown mode %s\n", mode);
  return 2;
}
