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
    if (argc >= 4 && !strcmp(argv[1], "decode"))
        return do_decode(argv[2], argv[3]);
    if (argc >= 5 && !strcmp(argv[1], "decoderes"))
        return do_decode_res(argv[2], argv[3], atoi(argv[4]));
    if (argc >= 4 && !strcmp(argv[1], "thumbnail"))
        return do_thumbnail(argv[2], argv[3]);
    fprintf(stderr, "usage: %s encode w h quality pattern out.cfhd | decode in.cfhd out.yuy2\n", argv[0]);
    return 2;
}
