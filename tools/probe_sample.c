/* Oracle probe: drive the reference CFHD SDK (built at .refbuild) to produce
 * golden end-to-end data for the TPU framework's tests.
 *
 *   probe_sample encode <w> <h> <quality> <pattern> <out.cfhd>
 *       Encode one deterministic YUY2 frame, write the sample bytes.
 *   probe_sample decode <in.cfhd> <out.yuy2>
 *       Decode a sample to YUY2 full resolution, write raw bytes.
 *
 * The deterministic frame must match tests (test_bitstream.py golden_frame):
 * integer plasma gradient + xorshift32 noise, all integer math.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "CFHDTypes.h"
#include "CFHDError.h"
#include "CFHDEncoder.h"
#include "CFHDDecoder.h"

static uint32_t xs32(uint32_t *s)
{
    uint32_t x = *s;
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    *s = x;
    return x;
}

/* Deterministic YUY2 frame: smooth gradients + small noise. */
static void fill_yuy2(uint8_t *buf, int w, int h, int pattern)
{
    uint32_t seed = 0x12345u + (uint32_t)pattern;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x += 2) {
            uint32_t r = xs32(&seed);
            int luma0 = ((x * 3 + y * 7) >> 2) & 0xFF;
            int luma1 = (((x + 1) * 3 + y * 7) >> 2) & 0xFF;
            int cb = ((x + y) >> 3) & 0xFF;
            int cr = ((x * 2 - y) >> 3) & 0xFF;
            if (pattern > 0) {            /* add +-4 noise */
                luma0 = (luma0 + (int)(r & 7)) & 0xFF;
                luma1 = (luma1 + (int)((r >> 3) & 7)) & 0xFF;
                cb = (cb + (int)((r >> 6) & 7)) & 0xFF;
                cr = (cr + (int)((r >> 9) & 7)) & 0xFF;
            }
            uint8_t *p = buf + (size_t)y * w * 2 + x * 2;
            p[0] = (uint8_t)luma0;
            p[1] = (uint8_t)cb;
            p[2] = (uint8_t)luma1;
            p[3] = (uint8_t)cr;
        }
    }
}

/* Deterministic 10-bit component values shared by the deep formats:
 * same plasma gradients as fill_yuy2 but at 10-bit with extra noise. */
static void fill_components10(int w, int h, int pattern, uint16_t *ybuf,
                              uint16_t *ubuf, uint16_t *vbuf)
{
    uint32_t seed = 0x54321u + (uint32_t)pattern;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x += 2) {
            uint32_t r = xs32(&seed);
            int y0 = ((x * 13 + y * 29) >> 1) & 0x3FF;
            int y1 = (((x + 1) * 13 + y * 29) >> 1) & 0x3FF;
            int cb = (512 + ((x - y) >> 2)) & 0x3FF;
            int cr = (512 + ((x / 2 + y) >> 2)) & 0x3FF;
            if (pattern > 0) {
                y0 = (y0 + (int)(r & 31)) & 0x3FF;
                y1 = (y1 + (int)((r >> 5) & 31)) & 0x3FF;
                cb = (cb + (int)((r >> 10) & 31)) & 0x3FF;
                cr = (cr + (int)((r >> 15) & 31)) & 0x3FF;
            }
            ybuf[y * w + x] = (uint16_t)y0;
            ybuf[y * w + x + 1] = (uint16_t)y1;
            ubuf[y * (w / 2) + x / 2] = (uint16_t)cb;
            vbuf[y * (w / 2) + x / 2] = (uint16_t)cr;
        }
    }
}

static int do_encode_v210(int w, int h, int quality, int pattern, const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_V210,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }

    uint16_t *yb = (uint16_t *)malloc(w * h * 2), *ub = (uint16_t *)malloc(w * h), *vb = (uint16_t *)malloc(w * h);
    fill_components10(w, h, pattern, yb, ub, vb);
    /* pack v210: 6 pixels per 4 words; pitch = ((w+47)/48)*128 bytes */
    int pitch = ((w + 47) / 48) * 128;
    uint32_t *buf = (uint32_t *)calloc(h, pitch);
    for (int y = 0; y < h; y++) {
        uint32_t *row = buf + (size_t)y * pitch / 4;
        const uint16_t *yp = yb + (size_t)y * w;
        const uint16_t *up = ub + (size_t)y * (w / 2);
        const uint16_t *vp = vb + (size_t)y * (w / 2);
        for (int x = 0; x < w; x += 6) {
            row[0] = (uint32_t)up[0] | ((uint32_t)yp[0] << 10) | ((uint32_t)vp[0] << 20);
            row[1] = (uint32_t)yp[1] | ((uint32_t)up[1] << 10) | ((uint32_t)yp[2] << 20);
            row[2] = (uint32_t)vp[1] | ((uint32_t)yp[3] << 10) | ((uint32_t)up[2] << 20);
            row[3] = (uint32_t)yp[4] | ((uint32_t)vp[2] << 10) | ((uint32_t)yp[5] << 20);
            row += 4; yp += 6; up += 3; vp += 3;
        }
    }
    err = CFHD_EncodeSample(enc, buf, pitch);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "v210 encoded %dx%d q=%d -> %zu bytes\n", w, h, quality, size);
    CFHD_CloseEncoder(enc);
    return 0;
}

static int do_encode_yu64(int w, int h, int quality, int pattern, const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_YU64,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }

    uint16_t *yb = (uint16_t *)malloc(w * h * 2), *ub = (uint16_t *)malloc(w * h), *vb = (uint16_t *)malloc(w * h);
    fill_components10(w, h, pattern, yb, ub, vb);
    /* YU64: per pixel pair: Y0 U Y1 V as 16-bit (10-bit << 6) */
    uint16_t *buf = (uint16_t *)malloc((size_t)w * h * 4);
    for (int y = 0; y < h; y++) {
        uint16_t *row = buf + (size_t)y * w * 2;
        for (int x = 0; x < w; x += 2) {
            row[2 * x + 0] = (uint16_t)(yb[y * w + x] << 6);
            row[2 * x + 1] = (uint16_t)(ub[y * (w / 2) + x / 2] << 6);
            row[2 * x + 2] = (uint16_t)(yb[y * w + x + 1] << 6);
            row[2 * x + 3] = (uint16_t)(vb[y * (w / 2) + x / 2] << 6);
        }
    }
    err = CFHD_EncodeSample(enc, buf, w * 4);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "yu64 encoded %dx%d q=%d -> %zu bytes\n", w, h, quality, size);
    CFHD_CloseEncoder(enc);
    return 0;
}

static int do_encode_rg48(int w, int h, int quality, int pattern, const char *path,
                          int alpha /* 0: RG48->RGB444, 1: B64A->RGBA4444 */)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(
        enc, w, h,
        alpha ? CFHD_PIXEL_FORMAT_B64A : CFHD_PIXEL_FORMAT_RG48,
        alpha ? CFHD_ENCODED_FORMAT_RGBA_4444 : CFHD_ENCODED_FORMAT_RGB_444,
        CFHD_ENCODING_FLAGS_NONE, (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }

    int ncomp = alpha ? 4 : 3;
    uint16_t *buf = (uint16_t *)malloc((size_t)w * h * ncomp * 2);
    uint32_t seed = 0xABCDEu + (uint32_t)pattern;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            uint32_t rnd = xs32(&seed);
            int r = ((x * 23 + y * 7) << 4) & 0xFFFF;
            int g = ((x * 11 + y * 17) << 4) & 0xFFFF;
            int b = ((x * 5 + y * 31) << 4) & 0xFFFF;
            if (pattern > 0) {
                r = (r + (int)(rnd & 1023)) & 0xFFFF;
                g = (g + (int)((rnd >> 10) & 1023)) & 0xFFFF;
                b = (b + (int)((rnd >> 20) & 1023)) & 0xFFFF;
            }
            uint16_t *p = buf + ((size_t)y * w + x) * ncomp;
            if (alpha) {            /* b64a: big-endian ARGB 16-bit */
                uint16_t a16 = (uint16_t)(0xFFFF - ((x + y) & 0xFF));
                p[0] = (uint16_t)((a16 >> 8) | (a16 << 8));
                p[1] = (uint16_t)((r >> 8) | (r << 8));
                p[2] = (uint16_t)((g >> 8) | (g << 8));
                p[3] = (uint16_t)((b >> 8) | (b << 8));
            } else {                /* RG48: RGB 16-bit little-endian */
                p[0] = (uint16_t)r;
                p[1] = (uint16_t)g;
                p[2] = (uint16_t)b;
            }
        }
    }
    err = CFHD_EncodeSample(enc, buf, w * ncomp * 2);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "%s encoded %dx%d q=%d -> %zu bytes\n",
            alpha ? "b64a" : "rg48", w, h, quality, size);
    CFHD_CloseEncoder(enc);
    return 0;
}

/* Encode from a deterministically-filled raw buffer whose bytes are the
 * same for every format: differences between the resulting samples reveal
 * exactly how the reference interprets each input format. */
static int do_encode_raw(const char *fmt, int w, int h, int quality,
                         int pattern, const char *path)
{
    CFHD_PixelFormat pf;
    CFHD_EncodedFormat ef = CFHD_ENCODED_FORMAT_RGB_444;
    int pitch;
    if (!strcmp(fmt, "r210")) { pf = CFHD_PIXEL_FORMAT_R210; pitch = w * 4; }
    else if (!strcmp(fmt, "DPX0")) { pf = CFHD_PIXEL_FORMAT_DPX0; pitch = w * 4; }
    else if (!strcmp(fmt, "RG30")) { pf = CFHD_PIXEL_FORMAT_RG30; pitch = w * 4; }
    else if (!strcmp(fmt, "AB10")) { pf = CFHD_PIXEL_FORMAT_AB10; pitch = w * 4; }
    else if (!strcmp(fmt, "AR10")) { pf = CFHD_PIXEL_FORMAT_AR10; pitch = w * 4; }
    else if (!strcmp(fmt, "BGRA")) { pf = CFHD_PIXEL_FORMAT_BGRA; pitch = w * 4; }
    else if (!strcmp(fmt, "BGRa")) { pf = CFHD_PIXEL_FORMAT_BGRa; pitch = w * 4; }
    else if (!strcmp(fmt, "RG24")) { pf = CFHD_PIXEL_FORMAT_RG24; pitch = w * 3; }
    else if (!strcmp(fmt, "RG64")) { pf = CFHD_PIXEL_FORMAT_RG64; pitch = w * 8;
                                     ef = CFHD_ENCODED_FORMAT_RGBA_4444; }
    else if (!strcmp(fmt, "BYR5")) { pf = CFHD_PIXEL_FORMAT_BYR5; pitch = w * 3 / 2;
                                     ef = CFHD_ENCODED_FORMAT_BAYER; }
    else if (!strcmp(fmt, "b48r")) { pf = CFHD_PIXEL_FORMAT_B48R; pitch = w * 6; }
    else if (!strcmp(fmt, "WP13")) { pf = CFHD_PIXEL_FORMAT_WP13; pitch = w * 6; }
    else if (!strcmp(fmt, "W13A")) { pf = CFHD_PIXEL_FORMAT_W13A; pitch = w * 8;
                                     ef = CFHD_ENCODED_FORMAT_RGBA_4444; }
    else if (!strcmp(fmt, "R408")) { pf = CFHD_PIXEL_FORMAT_R408; pitch = w * 4;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "V408")) { pf = CFHD_PIXEL_FORMAT_V408; pitch = w * 4;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "BYR2")) { pf = CFHD_PIXEL_FORMAT_BYR2; pitch = w * 2;
                                     ef = CFHD_ENCODED_FORMAT_BAYER; }
    else if (!strcmp(fmt, "YV12")) { pf = CFHD_PIXEL_FORMAT_YV12; pitch = w;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "NV12")) { pf = CFHD_PIXEL_FORMAT_NV12; pitch = w;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "avu8")) { pf = CFHD_PIXEL_FORMAT_CT_UCHAR; pitch = w * 2;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "av28")) { pf = CFHD_PIXEL_FORMAT_CT_10BIT_2_8; pitch = w * 2;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "a214")) { pf = CFHD_PIXEL_FORMAT_CT_SHORT_2_14; pitch = w * 4;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "a106")) { pf = CFHD_PIXEL_FORMAT_CT_USHORT_10_6; pitch = w * 4;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else if (!strcmp(fmt, "av16")) { pf = CFHD_PIXEL_FORMAT_CT_SHORT; pitch = w * 4;
                                     ef = CFHD_ENCODED_FORMAT_YUV_422; }
    else { fprintf(stderr, "unknown fmt %s\n", fmt); return 1; }

    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, pf, ef,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    size_t nbytes = (size_t)pitch * h;
    /* av28 is two planes (2-bit upper w*h/2 + 8-bit lower 2*w*h); the
       codec reads the full 2.5*w*h layout regardless of pitch */
    if (pf == CFHD_PIXEL_FORMAT_CT_10BIT_2_8) nbytes = (size_t)w * h * 5 / 2;
    uint8_t *buf = (uint8_t *)malloc(nbytes);
    uint32_t seed = 0x77777u + (uint32_t)pattern;
    for (size_t i = 0; i + 4 <= nbytes; i += 4) {
        uint32_t r = xs32(&seed);
        buf[i] = (uint8_t)r; buf[i+1] = (uint8_t)(r >> 8);
        buf[i+2] = (uint8_t)(r >> 16); buf[i+3] = (uint8_t)(r >> 24);
    }
    err = CFHD_EncodeSample(enc, buf, pitch);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "%s encoded %dx%d q=%d -> %zu bytes\n", fmt, w, h, quality, size);
    CFHD_CloseEncoder(enc);
    return 0;
}

/* Encode BYR4 with WBAL metadata attached (drives ApplyActiveMetaData on
 * decode: `Codec/bayer.c:7427`). r/g/b are white-balance gains x1000. */
static int do_encode_byr4_wbal(int w, int h, int quality, int pattern,
                               int r1000, int g1000, int b1000,
                               const char *path)
{
    CFHD_EncoderRef enc = NULL;
    CFHD_MetadataRef md = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_BYR4,
                                          CFHD_ENCODED_FORMAT_BAYER,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    CFHD_MetadataOpen(&md);
    /* WBAL payload layout is (r, g1, g2, b): the decoder SKIPS the
     * second green when building channel gains (DemoasicFrames.cpp:5766) */
    float wbal[4];
    uint32_t prcs = PROCESSING_ACTIVE | PROCESSING_WHITEBALANCE;
    wbal[0] = (float)r1000 / 1000.0f;
    wbal[1] = (float)g1000 / 1000.0f;
    wbal[2] = (float)g1000 / 1000.0f;
    wbal[3] = (float)b1000 / 1000.0f;
    CFHD_MetadataAdd(md, TAG_WHITE_BALANCE, METADATATYPE_FLOAT, 16,
                     (uint32_t *)wbal, 0);
    CFHD_MetadataAdd(md, TAG_PROCESS_PATH, (CFHD_MetadataType)'H', 4,
                     &prcs, 0);
    CFHD_MetadataAttach(enc, md);

    uint16_t *buf = (uint16_t *)malloc((size_t)w * h * 2);
    uint32_t seed = 0xBEEF0u + (uint32_t)pattern;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            uint32_t rnd = xs32(&seed);
            int v = ((x * 9 + y * 13) << 5) & 0xFFFF;
            if (pattern > 0) v = (v + (int)(rnd & 2047)) & 0xFFFF;
            buf[(size_t)y * w + x] = (uint16_t)v;
        }
    }
    err = CFHD_EncodeSample(enc, buf, w * 2);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "byr4+wbal %dx%d -> %zu bytes\n", w, h, size);
    CFHD_MetadataClose(md);
    CFHD_CloseEncoder(enc);
    free(buf);
    return 0;
}

/* Encode BYR4 with ARBITRARY metadata tags attached: each extra arg
 * triple is TAG(4 chars) TYPE(1 char) HEXPAYLOAD.  Drives any
 * ApplyActiveMetaData stage for develop-pinning goldens. */
static int do_encode_byr4_meta(int w, int h, int quality, int pattern,
                               const char *path, int ntags, char **tagargs)
{
    CFHD_EncoderRef enc = NULL;
    CFHD_MetadataRef md = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_BYR4,
                                          CFHD_ENCODED_FORMAT_BAYER,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    CFHD_MetadataOpen(&md);
    for (int t = 0; t < ntags; t++) {
        const char *tag = tagargs[3 * t];
        char typ = tagargs[3 * t + 1][0];
        const char *hex = tagargs[3 * t + 2];
        uint8_t payload[256];
        int n = 0;
        for (; hex[2 * n] && hex[2 * n + 1] && n < 256; n++) {
            unsigned v;
            sscanf(hex + 2 * n, "%2x", &v);
            payload[n] = (uint8_t)v;
        }
        CFHD_MetadataAdd(md, MAKETAG(tag[0], tag[1], tag[2], tag[3]),
                         (CFHD_MetadataType)typ, n, (uint32_t *)payload, 0);
    }
    CFHD_MetadataAttach(enc, md);
    uint16_t *buf = (uint16_t *)malloc((size_t)w * h * 2);
    uint32_t seed = 0xBEEF0u + (uint32_t)pattern;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            uint32_t rnd = xs32(&seed);
            int v = ((x * 9 + y * 13) << 5) & 0xFFFF;
            if (pattern > 0) v = (v + (int)(rnd & 2047)) & 0xFFFF;
            buf[(size_t)y * w + x] = (uint16_t)v;
        }
    }
    err = CFHD_EncodeSample(enc, buf, w * 2);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "byr4+meta %dx%d -> %zu bytes\n", w, h, size);
    CFHD_MetadataClose(md);
    CFHD_CloseEncoder(enc);
    free(buf);
    return 0;
}

static int do_encode_byr4(int w, int h, int quality, int pattern, const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_BYR4,
                                          CFHD_ENCODED_FORMAT_BAYER,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }

    /* Bayer mosaic, 16-bit per photosite: row pairs R G / G B */
    uint16_t *buf = (uint16_t *)malloc((size_t)w * h * 2);
    uint32_t seed = 0xBEEF0u + (uint32_t)pattern;
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) {
            uint32_t rnd = xs32(&seed);
            int v = ((x * 9 + y * 13) << 5) & 0xFFFF;
            if (pattern > 0) v = (v + (int)(rnd & 2047)) & 0xFFFF;
            buf[(size_t)y * w + x] = (uint16_t)v;
        }
    }
    err = CFHD_EncodeSample(enc, buf, w * 2);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "byr4 encoded %dx%d q=%d -> %zu bytes\n", w, h, quality, size);
    CFHD_CloseEncoder(enc);
    return 0;
}

static int do_encode_gop(int w, int h, int quality, int pattern, const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_YUY2,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_YUV_2FRAME_GOP,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }

    uint8_t *frame = (uint8_t *)malloc((size_t)w * h * 2);
    for (int i = 0; i < 2; i++) {
        fill_yuy2(frame, w, h, pattern >= 100 ? pattern : pattern + i);
        err = CFHD_EncodeSample(enc, frame, w * 2);
        fprintf(stderr, "frame %d: encode err=%d\n", i, err);
        void *sample = NULL; size_t size = 0;
        CFHD_Error gerr = CFHD_GetSampleData(enc, &sample, &size);
        fprintf(stderr, "frame %d: getdata err=%d size=%zu\n", i, gerr, size);
        if (gerr == 0 && size > 0) {
            char name[512];
            snprintf(name, sizeof(name), "%s.f%d", path, i);
            FILE *f = fopen(name, "wb");
            fwrite(sample, 1, size, f);
            fclose(f);
        }
    }
    CFHD_CloseEncoder(enc);
    free(frame);
    return 0;
}

/* Encode a stereo 3D sample: two eyes (pattern, pattern+1) stacked in a
 * double-height buffer, VCHN=2 metadata -> both eyes in ONE sample
 * (`Codec/encoder.c:3407-3438` stereo_encode loop). */
static int do_encode_3d(int w, int h, int quality, int pattern,
                        const char *path)
{
    CFHD_EncoderRef enc = NULL;
    CFHD_MetadataRef md = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    if (CFHD_MetadataOpen(&md)) return 1;
    uint32_t two = 2;
    CFHD_MetadataAdd(md, TAG_VIDEO_CHANNELS, (CFHD_MetadataType)'H', 4, &two, 0);
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_YUY2,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    /* attach after prepare: MergeMetadata needs the codec-level encoder */
    CFHD_MetadataAttach(enc, md);
    uint8_t *frame = (uint8_t *)malloc((size_t)w * h * 4);
    fill_yuy2(frame, w, h, pattern);
    fill_yuy2(frame + (size_t)w * h * 2, w, h, pattern + 1);
    err = CFHD_EncodeSample(enc, frame, w * 2);
    fprintf(stderr, "3d encode err=%d\n", err);
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size) == 0 && size > 0) {
        FILE *f = fopen(path, "wb");
        fwrite(sample, 1, size, f);
        fclose(f);
    }
    CFHD_MetadataClose(md);
    CFHD_CloseEncoder(enc);
    free(frame);
    return 0;
}

/* Encode N v210 frames at an uncompressed-target quality; print sizes
 * (the per-frame uncompressed decision, `Codec/encoder.c:1979-2018`). */
static int do_encode_v210_series(int w, int h, int quality, int nframes,
                                 const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_V210,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    int pitch = ((w + 47) / 48) * 128;
    uint16_t *yb = (uint16_t *)malloc(w * h * 2);
    uint16_t *ub = (uint16_t *)malloc(w * h), *vb = (uint16_t *)malloc(w * h);
    uint32_t *buf = (uint32_t *)calloc(h, pitch);
    for (int f = 0; f < nframes; f++) {
        fill_components10(w, h, f + 1, yb, ub, vb);
        for (int y = 0; y < h; y++) {
            uint32_t *row = buf + (size_t)y * pitch / 4;
            const uint16_t *yp = yb + (size_t)y * w;
            const uint16_t *up = ub + (size_t)y * (w / 2);
            const uint16_t *vp = vb + (size_t)y * (w / 2);
            for (int x = 0; x < w; x += 6) {
                row[0] = (uint32_t)up[0] | ((uint32_t)yp[0] << 10) | ((uint32_t)vp[0] << 20);
                row[1] = (uint32_t)yp[1] | ((uint32_t)up[1] << 10) | ((uint32_t)yp[2] << 20);
                row[2] = (uint32_t)vp[1] | ((uint32_t)yp[3] << 10) | ((uint32_t)up[2] << 20);
                row[3] = (uint32_t)yp[4] | ((uint32_t)vp[2] << 10) | ((uint32_t)yp[5] << 20);
                row += 4; yp += 6; up += 3; vp += 3;
            }
        }
        err = CFHD_EncodeSample(enc, buf, pitch);
        void *sample = NULL; size_t size = 0;
        CFHD_GetSampleData(enc, &sample, &size);
        printf("frame %d size %zu\n", f, size);
        if (path) {
            char name[512];
            snprintf(name, sizeof(name), "%s.f%d", path, f);
            FILE *fp = fopen(name, "wb");
            fwrite(sample, 1, size, fp);
            fclose(fp);
        }
    }
    CFHD_CloseEncoder(enc);
    return 0;
}

/* Encode a multi-frame YUY2 series with ONE encoder instance, saving each
 * sample, to expose cross-frame encoder state (quant adaptation). */
static int do_encode_series(int w, int h, int quality, int nframes,
                            const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_YUY2,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    uint8_t *frame = (uint8_t *)malloc((size_t)w * h * 2);
    for (int f = 0; f < nframes; f++) {
        fill_yuy2(frame, w, h, f + 1);
        err = CFHD_EncodeSample(enc, frame, w * 2);
        if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
        void *sample = NULL; size_t size = 0;
        CFHD_GetSampleData(enc, &sample, &size);
        printf("frame %d size %zu\n", f, size);
        if (path) {
            char name[512];
            snprintf(name, sizeof(name), "%s.f%d", path, f);
            FILE *fp = fopen(name, "wb");
            fwrite(sample, 1, size, fp);
            fclose(fp);
        }
    }
    CFHD_CloseEncoder(enc);
    free(frame);
    return 0;
}


/* Decode one eye (cact mask 1 = left, 2 = right) of a 3D sample. */
static int do_decode_3d(const char *inpath, const char *outpath, int cact)
{
    FILE *f = fopen(inpath, "rb");
    if (!f) { fprintf(stderr, "no input\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *sample = (uint8_t *)malloc((size_t)size);
    if (fread(sample, 1, (size_t)size, f) != (size_t)size) return 1;
    fclose(f);

    CFHD_DecoderRef dec = NULL;
    CFHD_MetadataRef md = NULL;
    if (CFHD_OpenDecoder(&dec, NULL)) return 1;
    int aw = 0, ah = 0;
    CFHD_PixelFormat afmt;
    CFHD_Error err = CFHD_PrepareToDecode(dec, 0, 0, CFHD_PIXEL_FORMAT_YUY2,
                                          CFHD_DECODED_RESOLUTION_FULL,
                                          CFHD_DECODING_FLAGS_NONE,
                                          sample, (size_t)size, &aw, &ah, &afmt);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    if (cact) {
        uint32_t mask = (uint32_t)cact;
        CFHD_OpenMetadata(&md);
        CFHD_SetActiveMetadata(dec, md, TAG_CHANNELS_ACTIVE,
                               METADATATYPE_UINT32, &mask, 4);
    }
    int pitch = aw * 2;
    uint8_t *out = (uint8_t *)malloc((size_t)pitch * (ah + 16));
    err = CFHD_DecodeSample(dec, sample, (size_t)size, out, pitch);
    if (err) { fprintf(stderr, "decode %d\n", err); return 1; }
    FILE *g = fopen(outpath, "wb");
    fwrite(out, 1, (size_t)pitch * ah, g);
    fclose(g);
    fprintf(stderr, "3d decoded cact=%d %dx%d\n", cact, aw, ah);
    CFHD_CloseDecoder(dec);
    return 0;
}

/* Encode an INTERLACED 2-frame GOP (HORZTEMP frame wavelets). */
static int do_encode_gop_ilace(int w, int h, int quality, int pattern,
                               const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_YUY2,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          (CFHD_EncodingFlags)
                                          (CFHD_ENCODING_FLAGS_YUV_2FRAME_GOP |
                                           CFHD_ENCODING_FLAGS_YUV_INTERLACED),
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    uint8_t *frame = (uint8_t *)malloc((size_t)w * h * 2);
    for (int i = 0; i < 2; i++) {
        fill_yuy2(frame, w, h, pattern >= 100 ? pattern : pattern + i);
        err = CFHD_EncodeSample(enc, frame, w * 2);
        fprintf(stderr, "frame %d: encode err=%d\n", i, err);
        void *sample = NULL; size_t size = 0;
        CFHD_Error gerr = CFHD_GetSampleData(enc, &sample, &size);
        if (gerr == 0 && size > 0) {
            char name[512];
            snprintf(name, sizeof(name), "%s.f%d", path, i);
            FILE *f = fopen(name, "wb");
            fwrite(sample, 1, size, f);
            fclose(f);
        }
    }
    CFHD_CloseEncoder(enc);
    free(frame);
    return 0;
}

/* Encode a 2-frame GOP from two raw YUY2 files (frame-pair probing). */
static int do_encode_gop_files(int w, int h, int quality, const char *in0,
                               const char *in1, const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_YUY2,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_YUV_2FRAME_GOP,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    uint8_t *frame = (uint8_t *)malloc((size_t)w * h * 2);
    const char *ins[2] = { in0, in1 };
    for (int i = 0; i < 2; i++) {
        FILE *f = fopen(ins[i], "rb");
        if (!f || fread(frame, 1, (size_t)w * h * 2, f) != (size_t)w * h * 2)
            return 1;
        fclose(f);
        err = CFHD_EncodeSample(enc, frame, w * 2);
        void *sample = NULL; size_t size = 0;
        CFHD_Error gerr = CFHD_GetSampleData(enc, &sample, &size);
        if (gerr == 0 && size > 0) {
            char name[512];
            snprintf(name, sizeof(name), "%s.f%d", path, i);
            FILE *g = fopen(name, "wb");
            fwrite(sample, 1, size, g);
            fclose(g);
        }
    }
    CFHD_CloseEncoder(enc);
    free(frame);
    return 0;
}

static int do_encode_uyvy(int w, int h, int quality, int pattern, const char *path)
{
    CFHD_EncoderRef enc = NULL;
    if (CFHD_OpenEncoder(&enc, NULL)) return 1;
    CFHD_Error err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_2VUY,
                                          CFHD_ENCODED_FORMAT_YUV_422,
                                          CFHD_ENCODING_FLAGS_NONE,
                                          (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    uint8_t *frame = (uint8_t *)malloc((size_t)w * h * 2);
    fill_yuy2(frame, w, h, pattern);
    /* convert YUY2 -> UYVY byte order (U Y0 V Y1) */
    for (size_t i = 0; i < (size_t)w * h * 2; i += 4) {
        uint8_t y0 = frame[i], u = frame[i+1], y1 = frame[i+2], v = frame[i+3];
        frame[i] = u; frame[i+1] = y0; frame[i+2] = v; frame[i+3] = y1;
    }
    err = CFHD_EncodeSample(enc, frame, w * 2);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }
    void *sample = NULL; size_t size = 0;
    if (CFHD_GetSampleData(enc, &sample, &size)) return 1;
    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "uyvy encoded %dx%d -> %zu bytes\n", w, h, size);
    CFHD_CloseEncoder(enc);
    free(frame);
    return 0;
}

static int do_encode(int w, int h, int quality, int pattern, const char *path)
{
    CFHD_EncoderRef enc = NULL;
    CFHD_Error err = CFHD_OpenEncoder(&enc, NULL);
    if (err) { fprintf(stderr, "open %d\n", err); return 1; }
    err = CFHD_PrepareToEncode(enc, w, h, CFHD_PIXEL_FORMAT_YUY2,
                               CFHD_ENCODED_FORMAT_YUV_422,
                               CFHD_ENCODING_FLAGS_NONE,
                               (CFHD_EncodingQuality)quality);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }

    uint8_t *frame = (uint8_t *)malloc((size_t)w * h * 2);
    fill_yuy2(frame, w, h, pattern);

    err = CFHD_EncodeSample(enc, frame, w * 2);
    if (err) { fprintf(stderr, "encode %d\n", err); return 1; }

    void *sample = NULL; size_t size = 0;
    err = CFHD_GetSampleData(enc, &sample, &size);
    if (err) { fprintf(stderr, "getdata %d\n", err); return 1; }

    FILE *f = fopen(path, "wb");
    fwrite(sample, 1, size, f);
    fclose(f);
    fprintf(stderr, "encoded %dx%d q=%d pattern=%d -> %zu bytes\n",
            w, h, quality, pattern, size);
    CFHD_CloseEncoder(enc);
    free(frame);
    return 0;
}

static int do_thumbnail(const char *inpath, const char *outpath)
{
    FILE *f = fopen(inpath, "rb");
    if (!f) { fprintf(stderr, "no input\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *sample = (uint8_t *)malloc((size_t)size);
    if (fread(sample, 1, (size_t)size, f) != (size_t)size) return 1;
    fclose(f);

    CFHD_DecoderRef dec = NULL;
    if (CFHD_OpenDecoder(&dec, NULL)) return 1;
    size_t w = 0, h = 0, outsize = 0;
    size_t cap = (size_t)size * 4 + (1 << 20);
    uint8_t *out = (uint8_t *)malloc(cap);
    CFHD_Error err = CFHD_GetThumbnail(dec, sample, (size_t)size,
                                       out, cap, 1 /* THUMBNAIL_FLAGS_ENABLE */,
                                       &w, &h, &outsize);
    if (err) { fprintf(stderr, "thumbnail %d\n", err); return 1; }
    FILE *g = fopen(outpath, "wb");
    fwrite(out, 1, outsize, g);
    fclose(g);
    fprintf(stderr, "thumbnail %zux%zu %zu bytes\n", w, h, outsize);
    CFHD_CloseDecoder(dec);
    return 0;
}

static int do_decode_res(const char *inpath, const char *outpath, int res)
{
    FILE *f = fopen(inpath, "rb");
    if (!f) { fprintf(stderr, "no input\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *sample = (uint8_t *)malloc((size_t)size);
    if (fread(sample, 1, (size_t)size, f) != (size_t)size) return 1;
    fclose(f);

    CFHD_DecoderRef dec = NULL;
    if (CFHD_OpenDecoder(&dec, NULL)) return 1;
    int aw = 0, ah = 0;
    CFHD_PixelFormat afmt;
    CFHD_Error err = CFHD_PrepareToDecode(dec, 0, 0, CFHD_PIXEL_FORMAT_YUY2,
                                          (CFHD_DecodedResolution)res,
                                          CFHD_DECODING_FLAGS_NONE,
                                          sample, (size_t)size, &aw, &ah, &afmt);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    int pitch = aw * 2;
    uint8_t *out = (uint8_t *)malloc((size_t)pitch * ah);
    err = CFHD_DecodeSample(dec, sample, (size_t)size, out, pitch);
    if (err) { fprintf(stderr, "decode %d\n", err); return 1; }
    FILE *g = fopen(outpath, "wb");
    fwrite(out, 1, (size_t)pitch * ah, g);
    fclose(g);
    fprintf(stderr, "decoded res=%d %dx%d -> %s\n", res, aw, ah, outpath);
    CFHD_CloseDecoder(dec);
    return 0;
}

/* Decode a 2-frame GOP: feed the sequence-header sample then the group
 * sample; call DecodeSample twice on the group to harvest both frames. */
static int do_decode_gop(const char *seqpath, const char *grppath, const char *outbase)
{
    FILE *f = fopen(grppath, "rb");
    if (!f) return 1;
    fseek(f, 0, SEEK_END); long gsize = ftell(f); fseek(f, 0, SEEK_SET);
    uint8_t *group = (uint8_t *)malloc(gsize);
    if (fread(group, 1, gsize, f) != (size_t)gsize) return 1;
    fclose(f);

    CFHD_DecoderRef dec = NULL;
    if (CFHD_OpenDecoder(&dec, NULL)) return 1;
    int aw = 0, ah = 0;
    CFHD_PixelFormat afmt;
    CFHD_Error err = CFHD_PrepareToDecode(dec, 0, 0, CFHD_PIXEL_FORMAT_YUY2,
                                          CFHD_DECODED_RESOLUTION_FULL,
                                          CFHD_DECODING_FLAGS_NONE,
                                          group, (size_t)gsize, &aw, &ah, &afmt);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    int pitch = aw * 2;
    uint8_t *out = (uint8_t *)malloc((size_t)pitch * ah);
    for (int i = 0; i < 2; i++) {
        err = CFHD_DecodeSample(dec, group, (size_t)gsize, out, pitch);
        fprintf(stderr, "gop decode call %d err=%d\n", i, err);
        if (!err) {
            char name[512];
            snprintf(name, sizeof(name), "%s.f%d.yuy2", outbase, i);
            FILE *g = fopen(name, "wb");
            fwrite(out, 1, (size_t)pitch * ah, g);
            fclose(g);
        }
    }
    CFHD_CloseDecoder(dec);
    return 0;
}

/* Decode to an arbitrary output pixel format. */
static int do_decode_fmt(const char *inpath, const char *fmt, const char *outpath)
{
    CFHD_PixelFormat pf;
    int bpp;
    if (!strcmp(fmt, "2vuy")) { pf = CFHD_PIXEL_FORMAT_2VUY; bpp = 2; }
    else if (!strcmp(fmt, "YU64")) { pf = CFHD_PIXEL_FORMAT_YU64; bpp = 4; }
    else if (!strcmp(fmt, "v210")) { pf = CFHD_PIXEL_FORMAT_V210; bpp = 0; }
    else if (!strcmp(fmt, "RG48")) { pf = CFHD_PIXEL_FORMAT_RG48; bpp = 6; }
    else if (!strcmp(fmt, "b64a")) { pf = CFHD_PIXEL_FORMAT_B64A; bpp = 8; }
    else if (!strcmp(fmt, "RG64")) { pf = CFHD_PIXEL_FORMAT_RG64; bpp = 8; }
    else if (!strcmp(fmt, "BGRA")) { pf = CFHD_PIXEL_FORMAT_BGRA; bpp = 4; }
    else if (!strcmp(fmt, "r210")) { pf = CFHD_PIXEL_FORMAT_R210; bpp = 4; }
    else if (!strcmp(fmt, "DPX0")) { pf = CFHD_PIXEL_FORMAT_DPX0; bpp = 4; }
    else if (!strcmp(fmt, "RG30")) { pf = CFHD_PIXEL_FORMAT_RG30; bpp = 4; }
    else if (!strcmp(fmt, "R408")) { pf = CFHD_PIXEL_FORMAT_R408; bpp = 4; }
    else if (!strcmp(fmt, "V408")) { pf = CFHD_PIXEL_FORMAT_V408; bpp = 4; }
    else if (!strcmp(fmt, "WP13")) { pf = CFHD_PIXEL_FORMAT_WP13; bpp = 6; }
    else if (!strcmp(fmt, "NV12")) { pf = CFHD_PIXEL_FORMAT_NV12; bpp = 1; }
    else if (!strcmp(fmt, "YV12")) { pf = CFHD_PIXEL_FORMAT_YV12; bpp = 1; }
    else if (!strcmp(fmt, "W13A")) { pf = CFHD_PIXEL_FORMAT_W13A; bpp = 8; }
    else if (!strcmp(fmt, "BGRa")) { pf = CFHD_PIXEL_FORMAT_BGRa; bpp = 4; }
    else if (!strcmp(fmt, "RG24")) { pf = CFHD_PIXEL_FORMAT_RG24; bpp = 3; }
    else if (!strcmp(fmt, "BYR2")) { pf = CFHD_PIXEL_FORMAT_BYR2; bpp = 2; }
    else if (!strcmp(fmt, "b48r")) { pf = CFHD_PIXEL_FORMAT_B48R; bpp = 6; }
    else if (!strcmp(fmt, "yuyv")) { pf = CFHD_PIXEL_FORMAT_YUYV; bpp = 2; }
    else if (!strcmp(fmt, "avu8")) { pf = CFHD_PIXEL_FORMAT_CT_UCHAR; bpp = 2; }
    else if (!strcmp(fmt, "av28")) { pf = CFHD_PIXEL_FORMAT_CT_10BIT_2_8; bpp = 2; }
    else if (!strcmp(fmt, "a214")) { pf = CFHD_PIXEL_FORMAT_CT_SHORT_2_14; bpp = 4; }
    else if (!strcmp(fmt, "a106")) { pf = CFHD_PIXEL_FORMAT_CT_USHORT_10_6; bpp = 4; }
    else if (!strcmp(fmt, "av16")) { pf = CFHD_PIXEL_FORMAT_CT_SHORT; bpp = 4; }
    else { fprintf(stderr, "unknown fmt %s\n", fmt); return 1; }

    FILE *f = fopen(inpath, "rb");
    if (!f) return 1;
    fseek(f, 0, SEEK_END); long size = ftell(f); fseek(f, 0, SEEK_SET);
    uint8_t *sample = (uint8_t *)malloc((size_t)size);
    if (fread(sample, 1, (size_t)size, f) != (size_t)size) return 1;
    fclose(f);
    CFHD_DecoderRef dec = NULL;
    if (CFHD_OpenDecoder(&dec, NULL)) return 1;
    int aw = 0, ah = 0;
    CFHD_PixelFormat afmt;
    CFHD_Error err = CFHD_PrepareToDecode(dec, 0, 0, pf,
                                          CFHD_DECODED_RESOLUTION_FULL,
                                          CFHD_DECODING_FLAGS_NONE,
                                          sample, (size_t)size, &aw, &ah, &afmt);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }
    int pitch = bpp ? aw * bpp : ((aw + 47) / 48) * 128;
    /* CbYCrY_10bit_2_8 writes two planes (2-bit upper + 8-bit lower =
       2.5 bytes/px); give every format generous slack */
    size_t outsize = (size_t)pitch * ah;
    if (pf == CFHD_PIXEL_FORMAT_CT_10BIT_2_8) outsize = (size_t)aw * ah * 5 / 2;
    uint8_t *out = (uint8_t *)calloc(1, outsize + (size_t)aw * ah * 4);
    err = CFHD_DecodeSample(dec, sample, (size_t)size, out, pitch);
    if (err) { fprintf(stderr, "decode %d\n", err); return 1; }
    FILE *g = fopen(outpath, "wb");
    fwrite(out, 1, outsize, g);
    fclose(g);
    fprintf(stderr, "decoded %s %dx%d pitch %d\n", fmt, aw, ah, pitch);
    CFHD_CloseDecoder(dec);
    return 0;
}

static int do_decode(const char *inpath, const char *outpath)
{
    FILE *f = fopen(inpath, "rb");
    if (!f) { fprintf(stderr, "no input\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *sample = (uint8_t *)malloc((size_t)size);
    if (fread(sample, 1, (size_t)size, f) != (size_t)size) return 1;
    fclose(f);

    CFHD_DecoderRef dec = NULL;
    CFHD_Error err = CFHD_OpenDecoder(&dec, NULL);
    if (err) { fprintf(stderr, "open %d\n", err); return 1; }

    int aw = 0, ah = 0;
    CFHD_PixelFormat afmt;
    err = CFHD_PrepareToDecode(dec, 0, 0, CFHD_PIXEL_FORMAT_YUY2,
                               CFHD_DECODED_RESOLUTION_FULL,
                               CFHD_DECODING_FLAGS_NONE,
                               sample, (size_t)size, &aw, &ah, &afmt);
    if (err) { fprintf(stderr, "prepare %d\n", err); return 1; }

    int pitch = aw * 2;
    uint8_t *out = (uint8_t *)malloc((size_t)pitch * ah);
    err = CFHD_DecodeSample(dec, sample, (size_t)size, out, pitch);
    if (err) { fprintf(stderr, "decode %d\n", err); return 1; }

    FILE *g = fopen(outpath, "wb");
    fwrite(out, 1, (size_t)pitch * ah, g);
    fclose(g);
    fprintf(stderr, "decoded %dx%d -> %s\n", aw, ah, outpath);
    CFHD_CloseDecoder(dec);
    free(sample);
    free(out);
    return 0;
}

int main(int argc, char **argv)
{
    if (argc >= 7 && !strcmp(argv[1], "encode"))
        return do_encode(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                         atoi(argv[5]), argv[6]);
    if (argc >= 7 && !strcmp(argv[1], "encode_uyvy"))
        return do_encode_uyvy(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                              atoi(argv[5]), argv[6]);
    if (argc >= 7 && !strcmp(argv[1], "encode_3d"))
        return do_encode_3d(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                            atoi(argv[5]), argv[6]);
    if (argc >= 10 && !strcmp(argv[1], "encode_byr4_wbal"))
        return do_encode_byr4_wbal(atoi(argv[2]), atoi(argv[3]),
                                   atoi(argv[4]), atoi(argv[5]),
                                   atoi(argv[6]), atoi(argv[7]),
                                   atoi(argv[8]), argv[9]);
    if (argc >= 7 && !strcmp(argv[1], "encode_byr4"))
        return do_encode_byr4(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                              atoi(argv[5]), argv[6]);
    if (argc >= 7 && !strcmp(argv[1], "encode_rg48"))
        return do_encode_rg48(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                              atoi(argv[5]), argv[6], 0);
    if (argc >= 7 && !strcmp(argv[1], "encode_b64a"))
        return do_encode_rg48(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                              atoi(argv[5]), argv[6], 1);
    if (argc >= 7 && !strcmp(argv[1], "encode_gop"))
        return do_encode_gop(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                             atoi(argv[5]), argv[6]);
    if (argc >= 8 && !strcmp(argv[1], "encode_raw"))
        return do_encode_raw(argv[2], atoi(argv[3]), atoi(argv[4]),
                             atoi(argv[5]), atoi(argv[6]), argv[7]);
    if (argc >= 6 && !strcmp(argv[1], "encode_series"))
        return do_encode_series(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                                atoi(argv[5]), argc > 6 ? argv[6] : NULL);
    if (argc >= 6 && !strcmp(argv[1], "encode_v210_series"))
        return do_encode_v210_series(atoi(argv[2]), atoi(argv[3]),
                                     atoi(argv[4]), atoi(argv[5]),
                                     argc > 6 ? argv[6] : NULL);
        if (argc >= 5 && !strcmp(argv[1], "decode_3d"))
        return do_decode_3d(argv[2], argv[3], atoi(argv[4]));
    if (argc >= 7 && !strcmp(argv[1], "encode_gop_ilace"))
        return do_encode_gop_ilace(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                                   atoi(argv[5]), argv[6]);
    if (argc >= 8 && !strcmp(argv[1], "encode_gop_files"))
        return do_encode_gop_files(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                                   argv[5], argv[6], argv[7]);
    if (argc >= 7 && !strcmp(argv[1], "encode_v210"))
        return do_encode_v210(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                              atoi(argv[5]), argv[6]);
    if (argc >= 7 && !strcmp(argv[1], "encode_yu64"))
        return do_encode_yu64(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                              atoi(argv[5]), argv[6]);
    if (argc >= 10 && !strcmp(argv[1], "encode_byr4_meta"))
        return do_encode_byr4_meta(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                                   atoi(argv[5]), argv[6], (argc - 7) / 3,
                                   argv + 7);
    if (argc >= 5 && !strcmp(argv[1], "decode_gop"))
        return do_decode_gop(argv[2], argv[3], argv[4]);
    if (argc >= 5 && !strcmp(argv[1], "decode_fmt"))
        return do_decode_fmt(argv[2], argv[3], argv[4]);
    if (argc >= 4 && !strcmp(argv[1], "decode"))
        return do_decode(argv[2], argv[3]);
    if (argc >= 5 && !strcmp(argv[1], "decoderes"))
        return do_decode_res(argv[2], argv[3], atoi(argv[4]));
    if (argc >= 4 && !strcmp(argv[1], "thumbnail"))
        return do_thumbnail(argv[2], argv[3]);
    fprintf(stderr, "usage: %s encode w h quality pattern out.cfhd | decode in.cfhd out.yuy2\n", argv[0]);
    return 2;
}
