// Batched SAM record formatting for the aligner's fast path.
//
// Equivalent role to the reference's AlnSinkSam::appendMate + BTString
// assembly (aln_sink.h:3024, sam.h): given column arrays for N simple
// (ungapped, clip-only CIGAR) alignments, emit complete SAM lines into one
// buffer. The Python host keeps only odd records (gapped/spliced/multi).
//
// Build: g++ -O3 -shared -fPIC -o libsamfmt.so samfmt.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>

namespace {

inline char* put_str(char* p, const char* s, int len) {
    std::memcpy(p, s, (size_t)len);
    return p + len;
}

inline char* put_int(char* p, int64_t v) {
    if (v < 0) { *p++ = '-'; v = -v; }
    char tmp[20];
    int n = 0;
    do { tmp[n++] = (char)('0' + v % 10); v /= 10; } while (v);
    while (n) *p++ = tmp[--n];
    return p;
}

inline char* put_tag_i(char* p, const char* tag, int64_t v) {
    *p++ = '\t';
    p = put_str(p, tag, 2);
    *p++ = ':'; *p++ = 'i'; *p++ = ':';
    return put_int(p, v);
}

}  // namespace

extern "C" {

// Format N simple SE records. CIGAR is c5 S / mid M / c3 S. Mismatch MD
// data: per-record slice [mm_off[i], mm_off[i+1]) of (mm_cols relative to
// the aligned region start, mm_ref ASCII ref base).
//
// Returns total bytes written; rec_ends[i] = end offset of record i.
int64_t format_se_batch(
    int32_t n,
    const int32_t* flag, const int32_t* rname_idx, const int32_t* pos1,
    const int32_t* mapq,
    const int32_t* c5, const int32_t* mid, const int32_t* c3,
    const int32_t* score, const int32_t* nmm, const int32_t* nm,
    const int32_t* zs,            // INT32_MIN = absent
    const int32_t* nh,
    const uint8_t* name_buf, const int64_t* name_off,
    const uint8_t* seq_buf, const uint8_t* qual_buf, const int64_t* seq_off,
    const int32_t* mm_cols, const uint8_t* mm_ref, const int64_t* mm_off,
    const uint8_t* refname_buf, const int64_t* refname_off,
    char* out, int64_t* rec_ends)
{
    char* p = out;
    for (int32_t i = 0; i < n; i++) {
        // QNAME
        p = put_str(p, (const char*)(name_buf + name_off[i]),
                    (int)(name_off[i + 1] - name_off[i]));
        *p++ = '\t';
        p = put_int(p, flag[i]); *p++ = '\t';
        int32_t r = rname_idx[i];
        p = put_str(p, (const char*)(refname_buf + refname_off[r]),
                    (int)(refname_off[r + 1] - refname_off[r]));
        *p++ = '\t';
        p = put_int(p, pos1[i]); *p++ = '\t';
        p = put_int(p, mapq[i]); *p++ = '\t';
        if (c5[i]) { p = put_int(p, c5[i]); *p++ = 'S'; }
        p = put_int(p, mid[i]); *p++ = 'M';
        if (c3[i]) { p = put_int(p, c3[i]); *p++ = 'S'; }
        p = put_str(p, "\t*\t0\t0\t", 7);
        int seq_len = (int)(seq_off[i + 1] - seq_off[i]);
        p = put_str(p, (const char*)(seq_buf + seq_off[i]), seq_len);
        *p++ = '\t';
        p = put_str(p, (const char*)(qual_buf + seq_off[i]), seq_len);
        // optional fields
        p = put_tag_i(p, "AS", score[i]);
        if (zs[i] != INT32_MIN) p = put_tag_i(p, "ZS", zs[i]);
        p = put_str(p, "\tXN:i:0", 7);
        p = put_tag_i(p, "XM", nmm[i]);
        p = put_str(p, "\tXO:i:0\tXG:i:0", 14);
        p = put_tag_i(p, "NM", nm[i]);
        // MD
        p = put_str(p, "\tMD:Z:", 6);
        int64_t m0 = mm_off[i], m1 = mm_off[i + 1];
        int32_t last = -1;
        for (int64_t m = m0; m < m1; m++) {
            p = put_int(p, mm_cols[m] - last - 1);
            *p++ = (char)mm_ref[m];
            last = mm_cols[m];
        }
        p = put_int(p, mid[i] - 1 - last);
        p = put_str(p, "\tYT:Z:UU", 8);
        p = put_tag_i(p, "NH", nh[i]);
        *p++ = '\n';
        rec_ends[i] = p - out;
    }
    return p - out;
}

// Paired records: same column layout as format_se_batch2 plus mate
// fields (RNEXT is always "=", PNEXT/TLEN given) and a YT:Z code
// (0 UU, 1 CP, 2 DP, 3 UP). ZS slot doubles for the unpaired-mate path.
int64_t format_pe_batch(
    int32_t nrec,
    const int32_t* read_of, const int32_t* flag,
    const int32_t* rname_idx, const int32_t* pos1, const int32_t* mapq,
    const int32_t* c5, const int32_t* mid, const int32_t* c3,
    const int32_t* pnext1, const int32_t* tlen, const int32_t* yt_code,
    const int32_t* score, const int32_t* nmm, const int32_t* nm,
    const int32_t* zs, const int32_t* nh,
    const uint8_t* name_buf, const int64_t* name_off,
    const uint8_t* seq_f, const uint8_t* qual_f,
    const uint8_t* seq_r, const uint8_t* qual_r, const int64_t* seq_off,
    const int32_t* mm_cols, const uint8_t* mm_ref, const int64_t* mm_off,
    const uint8_t* refname_buf, const int64_t* refname_off,
    char* out, int64_t cap, int64_t* rec_ends)
{
    static const char* yts[4] = {"UU", "CP", "DP", "UP"};
    char* p = out;
    for (int32_t i = 0; i < nrec; i++) {
        int32_t rd = read_of[i];
        int name_len = (int)(name_off[rd + 1] - name_off[rd]);
        int seq_len = (int)(seq_off[rd + 1] - seq_off[rd]);
        int32_t r = rname_idx[i];
        int rn_len = (int)(refname_off[r + 1] - refname_off[r]);
        int64_t n_mm = mm_off[i + 1] - mm_off[i];
        int64_t worst = 230 + name_len + rn_len + 2 * (int64_t)seq_len
                        + 12 * n_mm;
        if ((p - out) + worst > cap) return -1 - (int64_t)i;
        p = put_str(p, (const char*)(name_buf + name_off[rd]), name_len);
        *p++ = '\t';
        p = put_int(p, flag[i]); *p++ = '\t';
        p = put_str(p, (const char*)(refname_buf + refname_off[r]), rn_len);
        *p++ = '\t';
        p = put_int(p, pos1[i]); *p++ = '\t';
        p = put_int(p, mapq[i]); *p++ = '\t';
        if (c5[i]) { p = put_int(p, c5[i]); *p++ = 'S'; }
        p = put_int(p, mid[i]); *p++ = 'M';
        if (c3[i]) { p = put_int(p, c3[i]); *p++ = 'S'; }
        p = put_str(p, "\t=\t", 3);
        p = put_int(p, pnext1[i]); *p++ = '\t';
        p = put_int(p, tlen[i]); *p++ = '\t';
        const uint8_t* sq = (flag[i] & 16) ? seq_r : seq_f;
        const uint8_t* ql = (flag[i] & 16) ? qual_r : qual_f;
        p = put_str(p, (const char*)(sq + seq_off[rd]), seq_len);
        *p++ = '\t';
        p = put_str(p, (const char*)(ql + seq_off[rd]), seq_len);
        p = put_tag_i(p, "AS", score[i]);
        if (zs[i] != INT32_MIN) p = put_tag_i(p, "ZS", zs[i]);
        p = put_str(p, "\tXN:i:0", 7);
        p = put_tag_i(p, "XM", nmm[i]);
        p = put_str(p, "\tXO:i:0\tXG:i:0", 14);
        p = put_tag_i(p, "NM", nm[i]);
        p = put_str(p, "\tMD:Z:", 6);
        int64_t m0 = mm_off[i], m1 = mm_off[i + 1];
        int32_t last = -1;
        for (int64_t m = m0; m < m1; m++) {
            p = put_int(p, mm_cols[m] - last - 1);
            *p++ = (char)mm_ref[m];
            last = mm_cols[m];
        }
        p = put_int(p, mid[i] - 1 - last);
        p = put_str(p, "\tYT:Z:", 6);
        p = put_str(p, yts[yt_code[i] & 3], 2);
        p = put_tag_i(p, "NH", nh[i]);
        *p++ = '\n';
        rec_ends[i] = p - out;
    }
    return p - out;
}

// Format nrec SE records, possibly several per read (-k multi-mapping
// fast path). Per-record arrays are indexed by record; name/seq data is
// per READ via read_of[] indirection, with both orientations of SEQ/QUAL
// precomputed so secondary alignments on the other strand print correctly
// (flag bit 0x10 selects the reverse-complement buffers).
//
// Writes are bounds-checked against cap: the per-record worst case is
// computed before writing and the function returns -1 - i (first record i
// that did not fit) so the host can retry with a larger buffer — fixed
// buffer sizing is computed host-side from the true name/refname/seq
// lengths.
// Spliced columns (optional, may be null): gapn[i] > 0 writes the CIGAR
// as c5S m1M gapN (mid-m1)M c3S (one intron); xs[i] (0 none / 1 '+' /
// 2 '-') adds the XS:A strand tag between MD and YT (sam.h:930-940).
int64_t format_se_batch2(
    int32_t nrec,
    const int32_t* read_of, const int32_t* flag,
    const int32_t* rname_idx, const int32_t* pos1, const int32_t* mapq,
    const int32_t* c5, const int32_t* mid, const int32_t* c3,
    const int32_t* score, const int32_t* nmm, const int32_t* nm,
    const int32_t* zs,            // INT32_MIN = absent
    const int32_t* nh,
    const uint8_t* name_buf, const int64_t* name_off,
    const uint8_t* seq_f, const uint8_t* qual_f,
    const uint8_t* seq_r, const uint8_t* qual_r, const int64_t* seq_off,
    const int32_t* mm_cols, const uint8_t* mm_ref, const int64_t* mm_off,
    const uint8_t* refname_buf, const int64_t* refname_off,
    char* out, int64_t cap, int64_t* rec_ends,
    const int32_t* m1, const int32_t* gapn, const int32_t* xs)
{
    char* p = out;
    for (int32_t i = 0; i < nrec; i++) {
        int32_t rd = read_of[i];
        int name_len = (int)(name_off[rd + 1] - name_off[rd]);
        int seq_len = (int)(seq_off[rd + 1] - seq_off[rd]);
        int32_t r = rname_idx[i];
        if (r < 0) {
            // unaligned record (flag 4); mapq column carries the YF code
            // (0 none, 1 NS, 2 LN, 3 QC) — matches io/sam.format_unaligned
            int64_t worst = 64 + name_len + 2 * (int64_t)seq_len;
            if ((p - out) + worst > cap) return -1 - (int64_t)i;
            p = put_str(p, (const char*)(name_buf + name_off[rd]), name_len);
            *p++ = '\t';
            p = put_str(p, "4\t*\t0\t0\t*\t*\t0\t0\t", 16);
            p = put_str(p, (const char*)(seq_f + seq_off[rd]), seq_len);
            *p++ = '\t';
            p = put_str(p, (const char*)(qual_f + seq_off[rd]), seq_len);
            int32_t yf = mapq[i];
            if (yf == 1) p = put_str(p, "\tYF:Z:NS", 8);
            else if (yf == 2) p = put_str(p, "\tYF:Z:LN", 8);
            else if (yf == 3) p = put_str(p, "\tYF:Z:QC", 8);
            p = put_str(p, "\tYT:Z:UU", 8);
            *p++ = '\n';
            rec_ends[i] = p - out;
            continue;
        }
        int rn_len = (int)(refname_off[r + 1] - refname_off[r]);
        int64_t n_mm = mm_off[i + 1] - mm_off[i];
        // worst case: fixed fields/tags ~230 + variable parts
        int64_t worst = 230 + name_len + rn_len + 2 * (int64_t)seq_len
                        + 12 * n_mm;
        if ((p - out) + worst > cap) return -1 - (int64_t)i;
        p = put_str(p, (const char*)(name_buf + name_off[rd]), name_len);
        *p++ = '\t';
        p = put_int(p, flag[i]); *p++ = '\t';
        p = put_str(p, (const char*)(refname_buf + refname_off[r]), rn_len);
        *p++ = '\t';
        p = put_int(p, pos1[i]); *p++ = '\t';
        p = put_int(p, mapq[i]); *p++ = '\t';
        if (c5[i]) { p = put_int(p, c5[i]); *p++ = 'S'; }
        if (gapn && gapn[i] > 0) {
            p = put_int(p, m1[i]); *p++ = 'M';
            p = put_int(p, gapn[i]); *p++ = 'N';
            p = put_int(p, mid[i] - m1[i]); *p++ = 'M';
        } else {
            p = put_int(p, mid[i]); *p++ = 'M';
        }
        if (c3[i]) { p = put_int(p, c3[i]); *p++ = 'S'; }
        p = put_str(p, "\t*\t0\t0\t", 7);
        const uint8_t* sq = (flag[i] & 16) ? seq_r : seq_f;
        const uint8_t* ql = (flag[i] & 16) ? qual_r : qual_f;
        p = put_str(p, (const char*)(sq + seq_off[rd]), seq_len);
        *p++ = '\t';
        p = put_str(p, (const char*)(ql + seq_off[rd]), seq_len);
        p = put_tag_i(p, "AS", score[i]);
        if (zs[i] != INT32_MIN) p = put_tag_i(p, "ZS", zs[i]);
        p = put_str(p, "\tXN:i:0", 7);
        p = put_tag_i(p, "XM", nmm[i]);
        p = put_str(p, "\tXO:i:0\tXG:i:0", 14);
        p = put_tag_i(p, "NM", nm[i]);
        p = put_str(p, "\tMD:Z:", 6);
        int64_t m0 = mm_off[i], m1 = mm_off[i + 1];
        int32_t last = -1;
        for (int64_t m = m0; m < m1; m++) {
            p = put_int(p, mm_cols[m] - last - 1);
            *p++ = (char)mm_ref[m];
            last = mm_cols[m];
        }
        p = put_int(p, mid[i] - 1 - last);
        if (xs && xs[i]) {
            p = put_str(p, "\tXS:A:", 6);
            *p++ = (xs[i] == 1) ? '+' : '-';
        }
        p = put_str(p, "\tYT:Z:UU", 8);
        p = put_tag_i(p, "NH", nh[i]);
        *p++ = '\n';
        rec_ends[i] = p - out;
    }
    return p - out;
}

}  // extern "C"
