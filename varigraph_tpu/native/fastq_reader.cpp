// Native FASTQ/FASTA streaming reader + 2-bit base-code packer.
//
// Fills fixed-shape [batch, max_len] uint8 code matrices (A=0 C=1 G=2 T/U=3,
// other=4) directly from gzip or plain files, splitting long reads into
// overlapping segments (overlap k-1) exactly like the Python fallback in
// io/fastq.py.  This is the host feed for the device sketch kernel; the
// reference's equivalent is the kseq-based streaming in
// src/fastq_kmer.cpp:65-187.
//
// Build: g++ -O3 -shared -fPIC -o libvgfastq.so fastq_reader.cpp -lz
//
// C API (ctypes):
//   void* vgf_open(const char* path);
//   long  vgf_next_batch(void* h, unsigned char* out, long batch,
//                        long max_len, long k, long* bases_out);
//         -> rows filled (0 at EOF; out is pre-filled with 4 by caller)
//   void  vgf_close(void* h);

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

unsigned char code_table[256];

struct TableInit {
    TableInit() {
        memset(code_table, 4, sizeof(code_table));
        code_table['A'] = code_table['a'] = 0;
        code_table['C'] = code_table['c'] = 1;
        code_table['G'] = code_table['g'] = 2;
        code_table['T'] = code_table['t'] = 3;
        code_table['U'] = code_table['u'] = 3;
    }
} table_init;

struct Reader {
    gzFile fp = nullptr;
    bool is_fasta = false;
    bool started = false;
    std::string pending;      // carry-over sequence (FASTA) or segment tail
    std::string seq;          // current read being split into segments
    size_t seg_start = 0;     // next segment offset within seq
    bool have_seq = false;
    std::vector<char> linebuf;

    bool read_line(std::string& out) {
        out.clear();
        char buf[65536];
        for (;;) {
            if (gzgets(fp, buf, sizeof(buf)) == nullptr) return !out.empty();
            size_t n = strlen(buf);
            bool full_line = n > 0 && buf[n - 1] == '\n';
            out.append(buf, full_line ? n - 1 : n);
            if (full_line) return true;
        }
    }

    // fetch the next whole read sequence into `seq`; false at EOF
    bool next_record() {
        std::string line;
        if (!is_fasta) {
            // FASTQ: @header / seq / + / quals
            if (!read_line(line)) return false;        // header
            if (!read_line(seq)) return false;         // sequence
            read_line(line);                           // '+'
            read_line(line);                           // quals
            return true;
        }
        // FASTA: accumulate until next '>'
        seq.clear();
        if (!pending.empty()) {
            // pending holds the next header already consumed
            pending.clear();
        }
        for (;;) {
            if (!read_line(line)) return !seq.empty();
            if (!line.empty() && line[0] == '>') {
                if (!seq.empty()) { return true; }
                continue;  // leading header
            }
            seq += line;
        }
    }
};

}  // namespace

extern "C" {

void* vgf_open(const char* path) {
    gzFile fp = gzopen(path, "rb");
    if (!fp) return nullptr;
    Reader* r = new Reader();
    r->fp = fp;
    int c = gzgetc(fp);
    if (c < 0) { r->is_fasta = false; }
    else {
        r->is_fasta = (c == '>');
        gzungetc(c, fp);
    }
    if (r->is_fasta) {
        // consume the first header line
        std::string line;
        r->read_line(line);
    }
    return r;
}

long vgf_next_batch(void* handle, unsigned char* out, long batch,
                    long max_len, long k, long* bases_out) {
    Reader* r = static_cast<Reader*>(handle);
    long row = 0;
    long bases = 0;
    const long step = max_len - (k - 1);
    while (row < batch) {
        if (!r->have_seq) {
            if (!r->next_record()) break;
            r->seg_start = 0;
            r->have_seq = true;
            bases += (long)r->seq.size();
        }
        const std::string& s = r->seq;
        long n = (long)s.size();
        long start = (long)r->seg_start;
        long len = n - start;
        if (len > max_len) len = max_len;
        unsigned char* dst = out + row * max_len;
        const unsigned char* src =
            reinterpret_cast<const unsigned char*>(s.data()) + start;
        for (long i = 0; i < len; ++i) dst[i] = code_table[src[i]];
        ++row;
        if (start + max_len >= n) {
            r->have_seq = false;
        } else {
            r->seg_start = start + step;
        }
    }
    *bases_out = bases;
    return row;
}

void vgf_close(void* handle) {
    Reader* r = static_cast<Reader*>(handle);
    if (r->fp) gzclose(r->fp);
    delete r;
}

}  // extern "C"
