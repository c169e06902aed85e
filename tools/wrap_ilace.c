/* Interposition probe: dump every call to the reference decoder's
 * interlaced output kernel (`InvertInterlacedRow16s10bitToYUV`,
 * `Codec/temporal.c:5961`) — call order (= rand() window order: each
 * call consumes 16 rand()&1 draws) plus the input lowpass/highpass rows
 * per channel, so the Python model's tlow/thigh and dither windows can
 * be pinned row pair by row pair.
 *
 * Link into probe_sample with -Wl,--wrap=InvertInterlacedRow16s10bitToYUV.
 * Set WRAP_ILACE_LOG to the dump path (binary records).
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef int16_t PIXEL;

#ifdef __cplusplus
extern "C" {
#endif

void __real_InvertInterlacedRow16s10bitToYUV(
    PIXEL *lowpass[], PIXEL *highpass[], int num_channels,
    uint8_t *output, int pitch, int output_width, int frame_width,
    int chroma_offset);

void __wrap_InvertInterlacedRow16s10bitToYUV(
    PIXEL *lowpass[], PIXEL *highpass[], int num_channels,
    uint8_t *output, int pitch, int output_width, int frame_width,
    int chroma_offset)
{
    static FILE *log = NULL;
    static int ncalls = 0;
    if (!log) {
        const char *path = getenv("WRAP_ILACE_LOG");
        log = fopen(path ? path : "/tmp/wrap_ilace.bin", "wb");
    }
    if (log) {
        int32_t hdr[4] = { ncalls, num_channels, output_width, frame_width };
        fwrite(hdr, sizeof(int32_t), 4, log);
        /* channel c rows: luma output_width, chroma output_width/2 */
        for (int c = 0; c < num_channels; c++) {
            int w = c == 0 ? output_width : output_width / 2;
            fwrite(lowpass[c], sizeof(PIXEL), (size_t)w, log);
            fwrite(highpass[c], sizeof(PIXEL), (size_t)w, log);
        }
        fflush(log);
    }
    ncalls++;
    __real_InvertInterlacedRow16s10bitToYUV(
        lowpass, highpass, num_channels, output, pitch,
        output_width, frame_width, chroma_offset);
}

#ifdef __cplusplus
}
#endif
