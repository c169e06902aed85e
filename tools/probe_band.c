/* Drive the reference encoder's band entropy coder (EncodeQuantLongRuns +
 * FinishEncodeBand) on deterministic synthetic bands and dump the exact
 * bitstreams, as golden data for cineform_tpu.entropy.host.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "codebooks.h"
#include "vlc.h"
#include "bitstream.h"
#include "encoder.h"

extern CODESET cs9, cs17, cs18;

/* encoder.c globals not declared in encoder.h */
extern void EncodeQuantLongRuns(ENCODER *encoder, BITSTREAM *stream, PIXEL *image,
                                int width, int height, int pitch, int divisor,
                                int active_codebook);
extern void FinishEncodeBand(BITSTREAM *output, unsigned int code, int size);
extern void FlushBitstream(BITSTREAM *stream);

/* deterministic PRNG (xorshift32) so Python can reproduce the inputs */
static unsigned int xs_state;
static unsigned int xs_next(void)
{
    unsigned int x = xs_state;
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    xs_state = x;
    return x;
}

int main(void)
{
    static CODESET codesets[3];
    static ENCODER enc;           /* only the codebook fields are used */
    static uint8_t buffer[1 << 20];
    static PIXEL band[64 * 64];
    int t, i, cbidx;

    memcpy(&codesets[0], &cs9, sizeof(CODESET));
    memcpy(&codesets[1], &cs17, sizeof(CODESET));
    memcpy(&codesets[2], &cs18, sizeof(CODESET));
    if (!InitCodebooks(NULL, &codesets[0])) return 1;

    memset(&enc, 0, sizeof(enc));
    for (i = 0; i < 3; i++) {
        enc.codebook_runbook[i] = codesets[i].codebook_runbook;
        enc.valuebook[i] = codesets[i].valuebook;
        {
            int pos = codesets[i].tagsbook[0] - 1;
            enc.band_end_code[i] = (unsigned int)codesets[i].tagsbook[pos*2+2];
            enc.band_end_size[i] = (int)codesets[i].tagsbook[pos*2+1];
        }
    }

    /* test cases: (seed, width, height, density_percent, magnitude_cap, codeset) */
    {
        struct { unsigned seed; int w, h, density, cap, cb; } cases[] = {
            {1,  64, 16, 50, 10,   1},
            {2,  64, 16, 10, 100,  1},
            {3,  64, 64, 3,  1023, 1},
            {4,  60, 32, 25, 300,  1},
            {5,  64, 16, 50, 10,   0},
            {6,  64, 16, 10, 400,  0},
            {7,  64, 16, 50, 10,   2},
            {8,  64, 64, 2,  1023, 2},
            {9,  64, 16, 0,  1,    1},   /* all zeros */
            {10, 64, 16, 100, 5,   1},   /* fully dense */
            {11, 48, 8,  20, 2047, 1},   /* values beyond clamp */
        };
        int ncases = sizeof(cases)/sizeof(cases[0]);
        for (t = 0; t < ncases; t++) {
            BITSTREAM bs;
            int w = cases[t].w, h = cases[t].h, n = w * h;
            int nbytes, j;
            xs_state = cases[t].seed;
            cbidx = cases[t].cb;
            for (i = 0; i < n; i++) {
                unsigned r = xs_next();
                int nonzero = (int)(r % 100) < cases[t].density;
                int mag = (int)((r >> 8) % (unsigned)cases[t].cap) + 1;
                int sign = (r >> 30) & 1;
                band[i] = nonzero ? (PIXEL)(sign ? -mag : mag) : 0;
            }
            InitBitstream(&bs);
            SetBitstreamBuffer(&bs, buffer, sizeof(buffer), BITSTREAM_ACCESS_WRITE);
            EncodeQuantLongRuns(&enc, &bs, band, w, h, w * (int)sizeof(PIXEL), 1, cbidx);
            FinishEncodeBand(&bs, enc.band_end_code[cbidx], enc.band_end_size[cbidx]);
            FlushBitstream(&bs);
            nbytes = (int)(bs.lpCurrentWord - buffer);
            printf("CASE seed=%u w=%d h=%d density=%d cap=%d cb=%d nbytes=%d\n",
                   cases[t].seed, w, h, cases[t].density, cases[t].cap, cbidx, nbytes);
            printf("DATA ");
            for (j = 0; j < nbytes; j++) printf("%02X", buffer[j]);
            printf("\n");
        }
    }
    return 0;
}
