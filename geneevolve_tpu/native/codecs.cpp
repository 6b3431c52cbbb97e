// Native host-side text codecs for the hot I/O paths.
//
// The reference implements its entire I/O layer in C++ (libStatGen's VCF
// classes plus src/format_{hap,plink,vcf}.cpp); this library is the
// TPU-framework equivalent: the O(n*m) text<->matrix conversions run here at
// memory speed while Python keeps the (cheap) per-file orchestration.
//
// Exposed via a C ABI for ctypes (no pybind11 in the image).
//
//   hap_parse     .hap text -> (m, 2n) uint8 alleles (caller transposes)
//   hap_format    (m, 2n) alleles -> .hap text ("0 1 ... \n" per SNP row)
//   vcf_count     count data records + samples in a VCF buffer
//   vcf_parse_gt  VCF buffer -> per-record fixed-column offsets + GT matrix
//   gt_format     (n, m) pair matrix -> "\t a|b" GT tails per record
//   ped_format    (n, m, 2) allele letters -> PED genotype tail per individual
//
// All functions return 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstring>

extern "C" {

// Parse a .hap buffer: rows of "c c c ... c\n" where alleles sit at even
// character offsets (strict positional parse, format_hap.cpp:95-106).
// out must hold nrows*ncols bytes (SNP-major). Returns 0, or -(line+1) on a
// character that is not '0'/'1'.
int64_t hap_parse(const char* buf, int64_t len, int64_t nrows, int64_t ncols,
                  uint8_t* out) {
    int64_t row = 0;
    int64_t i = 0;
    while (i < len && row < nrows) {
        // parse one line
        uint8_t* dst = out + row * ncols;
        int64_t col = 0;
        while (col < ncols) {
            char c = buf[i];
            if (c != '0' && c != '1') return -(row + 1);
            dst[col++] = (uint8_t)(c - '0');
            i += 2;  // skip the separator
        }
        // skip to end of line
        while (i < len && buf[i] != '\n') i++;
        i++;
        row++;
    }
    return row == nrows ? 0 : -(row + 1);
}

// Format a SNP-major (nrows, ncols) 0/1 matrix as .hap text: every allele
// followed by a space, newline-terminated rows (format_hap.cpp:17-25).
// out must hold nrows*(2*ncols+1) bytes. Returns bytes written.
int64_t hap_format(const uint8_t* mat, int64_t nrows, int64_t ncols,
                   char* out) {
    char* p = out;
    for (int64_t r = 0; r < nrows; ++r) {
        const uint8_t* src = mat + r * ncols;
        for (int64_t c = 0; c < ncols; ++c) {
            *p++ = (char)('0' + src[c]);
            *p++ = ' ';
        }
        p[-1] = ' ';  // reference writes trailing space then newline
        *p++ = '\n';
    }
    return (int64_t)(p - out);
}

// First pass over a VCF buffer: counts usable biallelic data records and
// samples. A record is counted if it has >= 10 tab-separated fields and its
// ALT has no ','. Multi-allelic records are skipped, filter status is NOT
// enforced (format_vcf.cpp:114-121,172-178).
int64_t vcf_count(const char* buf, int64_t len, int64_t* n_records,
                  int64_t* n_samples) {
    int64_t records = 0, samples = -1;
    int64_t i = 0;
    while (i < len) {
        int64_t line_start = i;
        while (i < len && buf[i] != '\n') i++;
        int64_t line_end = i;
        i++;
        if (line_end - line_start < 1) continue;
        if (buf[line_start] == '#') {
            if (line_end - line_start >= 6 &&
                memcmp(buf + line_start, "#CHROM", 6) == 0) {
                int64_t tabs = 0;
                for (int64_t j = line_start; j < line_end; ++j)
                    if (buf[j] == '\t') tabs++;
                samples = tabs - 8;
            }
            continue;
        }
        // count tabs; find ALT (field 5)
        int64_t tabs = 0;
        bool multiallelic = false;
        int64_t field = 0;
        for (int64_t j = line_start; j < line_end; ++j) {
            if (buf[j] == '\t') {
                tabs++;
                field++;
            } else if (field == 4 && buf[j] == ',') {
                multiallelic = true;
            }
        }
        if (tabs >= 9 && !multiallelic) records++;
    }
    *n_records = records;
    *n_samples = samples;
    return 0;
}

// Second pass: fill GT matrix (2*n_samples, n_records) hap-major and record
// the byte offset/length of each kept record's first 9 columns (for Python
// to slice CHROM..FORMAT without re-scanning). gt is indexed
// gt[h * n_records + rec]. Unknown '.' alleles become 0 (format_vcf semantics:
// anything not '0' maps by digit; we map '.'->0 like the Python codec).
int64_t vcf_parse_gt(const char* buf, int64_t len, int64_t n_records,
                     int64_t n_samples, uint8_t* gt, int64_t* rec_off,
                     int64_t* rec_len) {
    int64_t rec = 0;
    int64_t i = 0;
    while (i < len && rec < n_records) {
        int64_t line_start = i;
        while (i < len && buf[i] != '\n') i++;
        int64_t line_end = i;
        i++;
        if (line_end - line_start < 1 || buf[line_start] == '#') continue;
        // locate field boundaries
        int64_t field = 0;
        bool multiallelic = false;
        int64_t fixed_end = line_end;  // end of field 8 (FORMAT)
        int64_t tabs = 0;
        for (int64_t j = line_start; j < line_end; ++j) {
            if (buf[j] == '\t') {
                tabs++;
                field++;
                if (field == 9) fixed_end = j;
            } else if (field == 4 && buf[j] == ',') {
                multiallelic = true;
            }
        }
        if (tabs < 9 || multiallelic) continue;
        rec_off[rec] = line_start;
        rec_len[rec] = fixed_end - line_start;
        // parse GT cells after fixed_end
        int64_t j = fixed_end + 1;
        for (int64_t s = 0; s < n_samples; ++s) {
            // cell runs to next tab or line end; GT is the part before ':'
            char a = buf[j];
            uint8_t va = (a >= '1' && a <= '9') ? 1 : 0;
            // advance past first allele (may be multi-digit)
            while (j < line_end && buf[j] != '|' && buf[j] != '/' &&
                   buf[j] != '\t')
                j++;
            uint8_t vb = 0;
            if (j < line_end && (buf[j] == '|' || buf[j] == '/')) {
                j++;
                char b = buf[j];
                vb = (b >= '1' && b <= '9') ? 1 : 0;
            }
            gt[(2 * s) * n_records + rec] = va;
            gt[(2 * s + 1) * n_records + rec] = vb;
            // advance to next cell
            while (j < line_end && buf[j] != '\t') j++;
            j++;
        }
        rec++;
    }
    return rec == n_records ? 0 : -(rec + 1);
}

// Format GT tails: for record j write "\ta|b" for every sample into out.
// hapA/hapB are (n_samples, n_records) row-major. Each record tail is
// 4*n_samples bytes followed by '\n'. Returns bytes written.
int64_t gt_format(const uint8_t* hapA, const uint8_t* hapB,
                  int64_t n_samples, int64_t n_records, char* out) {
    char* p = out;
    for (int64_t j = 0; j < n_records; ++j) {
        for (int64_t s = 0; s < n_samples; ++s) {
            *p++ = '\t';
            *p++ = (char)('0' + hapA[s * n_records + j]);
            *p++ = '|';
            *p++ = (char)('0' + hapB[s * n_records + j]);
        }
        *p++ = '\n';
    }
    return (int64_t)(p - out);
}

// Format the genotype tail of one PED row: " A A G G ..." for m SNPs with
// allele letters. letters is (m, 2) of single chars; out needs 4*m bytes.
int64_t ped_format(const char* letters, int64_t m, char* out) {
    char* p = out;
    for (int64_t j = 0; j < m; ++j) {
        *p++ = ' ';
        *p++ = letters[2 * j];
        *p++ = ' ';
        *p++ = letters[2 * j + 1];
    }
    return (int64_t)(p - out);
}

}  // extern "C"
