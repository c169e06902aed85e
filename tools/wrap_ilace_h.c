/* Interposition probe: dump the inputs of every
 * InvertHorizontalRow16s8sTo16sBuffered call (the horizontal 2-6
 * inverse feeding the interlaced output kernel,
 * `Codec/decoder.c:21614-21627`): the lowpass row and the
 * (already-dequantized under _DEQUANTIZE_IN_FSM) highpass row, plus
 * quantizers and width, so the band-level inputs of the HORZTEMP
 * inverse can be pinned against the Python model.
 *
 * Link with -Wl,--wrap=InvertHorizontalRow16s8sTo16sBuffered.
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>

typedef int16_t PIXEL;
typedef int8_t PIXEL8S;

#ifdef __cplusplus
extern "C" {
#endif

void __real_InvertHorizontalRow16s8sTo16sBuffered(
    PIXEL *lowpass, int lowpass_quantization, PIXEL8S *highpass,
    int highpass_quantization, PIXEL *output, int width, PIXEL *buffer);

void __wrap_InvertHorizontalRow16s8sTo16sBuffered(
    PIXEL *lowpass, int lowpass_quantization, PIXEL8S *highpass,
    int highpass_quantization, PIXEL *output, int width, PIXEL *buffer)
{
    static FILE *log = NULL;
    static int ncalls = 0;
    if (!log) {
        const char *path = getenv("WRAP_ILACE_H_LOG");
        log = fopen(path ? path : "/tmp/wrap_ilace_h.bin", "wb");
    }
    if (log) {
        int32_t hdr[4] = { ncalls, width, lowpass_quantization,
                           highpass_quantization };
        fwrite(hdr, sizeof(int32_t), 4, log);
        fwrite(lowpass, sizeof(PIXEL), (size_t)width, log);
        fwrite(highpass, sizeof(PIXEL), (size_t)width, log);
        fflush(log);
    }
    ncalls++;
    __real_InvertHorizontalRow16s8sTo16sBuffered(
        lowpass, lowpass_quantization, highpass, highpass_quantization,
        output, width, buffer);
}

#ifdef __cplusplus
}
#endif
