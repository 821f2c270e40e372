// Minimal fast PNG decoder for dataset ingest (8-bit gray/RGB/RGBA,
// 16-bit gray — the formats TUM/EuRoC/KITTI actually ship).
//
// Native-runtime counterpart of the reference's C++ data path: the
// reference decodes nothing (its recorder dumps raw buffers,
// reference src/RealSense/SaveRawData.cpp:115-140, and nvJPEG handles the
// telemetry encode, buildStream.cpp:266-277); a dataset-replay framework
// lives or dies on PNG decode throughput, so that is the hot loop we give
// to C++.  Critical chunks only, zlib for IDAT, defilter in row-parallel
// friendly form.  No interlacing (Adam7 rejected), no palette.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

namespace {

struct Reader {
    const uint8_t* p;
    size_t n;
    size_t off = 0;
    bool fail = false;

    uint32_t u32() {
        if (off + 4 > n) { fail = true; return 0; }
        uint32_t v = (uint32_t(p[off]) << 24) | (uint32_t(p[off + 1]) << 16) |
                     (uint32_t(p[off + 2]) << 8) | uint32_t(p[off + 3]);
        off += 4;
        return v;
    }
    const uint8_t* bytes(size_t k) {
        if (off + k > n) { fail = true; return nullptr; }
        const uint8_t* q = p + off;
        off += k;
        return q;
    }
};

inline uint8_t paeth(int a, int b, int c) {
    int pp = a + b - c;
    int pa = pp > a ? pp - a : a - pp;
    int pb = pp > b ? pp - b : b - pp;
    int pc = pp > c ? pp - c : c - pp;
    if (pa <= pb && pa <= pc) return uint8_t(a);
    if (pb <= pc) return uint8_t(b);
    return uint8_t(c);
}

}  // namespace

extern "C" {

// Parse header only.  Returns 0 on success and fills width/height/
// channels/bit_depth.
int png_probe(const uint8_t* data, size_t size, int* width, int* height,
              int* channels, int* bit_depth) {
    static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (size < 33 || memcmp(data, magic, 8) != 0) return -1;
    Reader r{data, size, 8};
    uint32_t len = r.u32();
    const uint8_t* type = r.bytes(4);
    if (r.fail || len != 13 || memcmp(type, "IHDR", 4) != 0) return -2;
    uint32_t w = r.u32(), h = r.u32();
    const uint8_t* rest = r.bytes(5);
    if (r.fail) return -2;
    int depth = rest[0], color = rest[1], interlace = rest[4];
    if (interlace != 0) return -3;          // Adam7 unsupported
    int ch;
    switch (color) {
        case 0: ch = 1; break;               // gray
        case 2: ch = 3; break;               // RGB
        case 4: ch = 2; break;               // gray+alpha
        case 6: ch = 4; break;               // RGBA
        default: return -4;                  // palette unsupported
    }
    if (depth != 8 && depth != 16) return -5;
    *width = int(w);
    *height = int(h);
    *channels = ch;
    *bit_depth = depth;
    return 0;
}

// Decode into caller-provided buffer `out` of size height*width*channels*
// (bit_depth/8) bytes.  16-bit output is native-endian uint16.
// Returns 0 on success.
int png_decode(const uint8_t* data, size_t size, uint8_t* out,
               size_t out_size) {
    int w, h, ch, depth;
    int rc = png_probe(data, size, &w, &h, &ch, &depth);
    if (rc != 0) return rc;
    const int bypp = ch * depth / 8;         // bytes per pixel
    const size_t stride = size_t(w) * bypp;
    if (out_size < stride * h) return -6;

    // concatenate IDAT payloads
    std::vector<uint8_t> idat;
    idat.reserve(size);
    Reader r{data, size, 8};
    while (!r.fail && r.off + 8 <= r.n) {
        uint32_t len = r.u32();
        const uint8_t* type = r.bytes(4);
        if (r.fail) break;
        const uint8_t* payload = r.bytes(len);
        if (r.fail) break;
        r.bytes(4);  // CRC (skipped; dataset files are trusted local data)
        if (memcmp(type, "IDAT", 4) == 0)
            idat.insert(idat.end(), payload, payload + len);
        else if (memcmp(type, "IEND", 4) == 0)
            break;
    }
    if (idat.empty()) return -7;

    // inflate to (1 filter byte + stride) per row
    const size_t raw_size = size_t(h) * (stride + 1);
    std::vector<uint8_t> raw(raw_size);
    z_stream zs;
    memset(&zs, 0, sizeof(zs));
    if (inflateInit(&zs) != Z_OK) return -8;
    zs.next_in = idat.data();
    zs.avail_in = uInt(idat.size());
    zs.next_out = raw.data();
    zs.avail_out = uInt(raw_size);
    int zrc = inflate(&zs, Z_FINISH);
    inflateEnd(&zs);
    if (zrc != Z_STREAM_END && !(zrc == Z_OK && zs.avail_out == 0))
        return -9;

    // defilter
    std::vector<uint8_t> prev_row(stride, 0);
    for (int y = 0; y < h; ++y) {
        const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
        uint8_t filter = src[0];
        const uint8_t* s = src + 1;
        uint8_t* dst = out + size_t(y) * stride;
        switch (filter) {
            case 0:
                memcpy(dst, s, stride);
                break;
            case 1:
                for (size_t x = 0; x < stride; ++x) {
                    uint8_t left = x >= size_t(bypp) ? dst[x - bypp] : 0;
                    dst[x] = uint8_t(s[x] + left);
                }
                break;
            case 2:
                for (size_t x = 0; x < stride; ++x)
                    dst[x] = uint8_t(s[x] + prev_row[x]);
                break;
            case 3:
                for (size_t x = 0; x < stride; ++x) {
                    uint8_t left = x >= size_t(bypp) ? dst[x - bypp] : 0;
                    dst[x] = uint8_t(s[x] + ((left + prev_row[x]) >> 1));
                }
                break;
            case 4:
                for (size_t x = 0; x < stride; ++x) {
                    uint8_t left = x >= size_t(bypp) ? dst[x - bypp] : 0;
                    uint8_t ul = x >= size_t(bypp) ? prev_row[x - bypp] : 0;
                    dst[x] = uint8_t(s[x] + paeth(left, prev_row[x], ul));
                }
                break;
            default:
                return -10;
        }
        memcpy(prev_row.data(), dst, stride);
    }

    // PNG 16-bit samples are big-endian; convert to native little-endian
    if (depth == 16) {
        for (size_t i = 0; i + 1 < stride * h; i += 2) {
            uint8_t hi = out[i];
            out[i] = out[i + 1];
            out[i + 1] = hi;
        }
    }
    return 0;
}

}  // extern "C"
