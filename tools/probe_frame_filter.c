/* Micro-oracle: drive the reference's interlaced frame-wavelet row kernels
 * directly (they are non-static in Codec/spatial.c / Codec/temporal.c) so the
 * TPU model can be pinned against them column by column.
 *
 *   probe_frame_filter diff <width> <lp_divisor> <seed>
 *       Random int16 input row -> FilterHorizontalRowScaled16sDifferenceFiltered
 *       prints: input, lowpass(delta-coded), highpass rows.
 *   probe_frame_filter temporal <frame_width> <seed>
 *       Two random YUY2 byte rows -> FilterTemporalRowYUYVChannelTo16s
 *       per channel; prints lowpass and highpass rows.
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>

typedef int16_t PIXEL;

extern void FilterHorizontalRowScaled16sDifferenceFiltered(
    PIXEL *input, PIXEL *lowpass, PIXEL *highpass,
    int width, int lowpass_scale, int highpass_scale, int lowpass_divisor);

extern void FilterTemporalRowYUYVChannelTo16s(
    uint8_t *row1, uint8_t *row2, int frame_width, int channel,
    PIXEL *lowpass, PIXEL *highpass, int offset, int precision, int limit_yuv);

static uint32_t xs32(uint32_t *s)
{
    uint32_t x = *s;
    x ^= x << 13; x ^= x >> 17; x ^= x << 5;
    *s = x;
    return x;
}

static void print_row(const char *name, PIXEL *row, int n)
{
    printf("%s", name);
    for (int i = 0; i < n; i++) printf(" %d", row[i]);
    printf("\n");
}

int main(int argc, char **argv)
{
    if (argc >= 4 && !strcmp(argv[1], "diff")) {
        /* optional 5th arg: number of nonzero "garbage" values placed
         * beyond the row end (the encoder's scratch buffers are adjacent,
         * so the SSE pipeline's overreads see real data there) */
        int width = atoi(argv[2]);
        int div = atoi(argv[3]);
        uint32_t seed = argc > 4 ? (uint32_t)atoi(argv[4]) : 1;
        int ngarb = argc > 5 ? atoi(argv[5]) : 0;
        PIXEL *input = calloc(width + 64, sizeof(PIXEL));
        PIXEL *low = calloc(width + 64, sizeof(PIXEL));
        PIXEL *high = calloc(width + 64, sizeof(PIXEL));
        for (int i = 0; i < width + ngarb; i++)
            input[i] = (PIXEL)((int)(xs32(&seed) % 4093) - 2046);
        print_row("input", input, width + ngarb);
        FilterHorizontalRowScaled16sDifferenceFiltered(
            input, low, high, width, 0, 0, div);
        print_row("low", low, width / 2);
        print_row("high", high, width / 2);
        return 0;
    }
    if (argc >= 3 && !strcmp(argv[1], "temporal")) {
        int fw = atoi(argv[2]);
        uint32_t seed = argc > 3 ? (uint32_t)atoi(argv[3]) : 1;
        uint8_t *r1 = calloc(fw * 2 + 64, 1);
        uint8_t *r2 = calloc(fw * 2 + 64, 1);
        for (int i = 0; i < fw * 2; i++) {
            r1[i] = (uint8_t)(xs32(&seed) & 0xFF);
            r2[i] = (uint8_t)(xs32(&seed) & 0xFF);
        }
        printf("row1");
        for (int i = 0; i < fw * 2; i++) printf(" %d", r1[i]);
        printf("\nrow2");
        for (int i = 0; i < fw * 2; i++) printf(" %d", r2[i]);
        printf("\n");
        for (int ch = 0; ch < 3; ch++) {
            int n = ch == 0 ? fw : fw / 2;
            PIXEL *low = calloc(fw + 64, sizeof(PIXEL));
            PIXEL *high = calloc(fw + 64, sizeof(PIXEL));
            FilterTemporalRowYUYVChannelTo16s(r1, r2, fw, ch, low, high,
                                              0, 10, 0);
            char name[32];
            snprintf(name, sizeof(name), "low%d", ch);
            print_row(name, low, n);
            snprintf(name, sizeof(name), "high%d", ch);
            print_row(name, high, n);
        }
        return 0;
    }
    fprintf(stderr, "usage: %s diff|temporal ...\n", argv[0]);
    return 1;
}
