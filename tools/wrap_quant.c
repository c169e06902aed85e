/* Linker-interposition probe: dump pre-quant coefficient rows flowing
 * through QuantizeRow16sTo16s (called cross-TU from the spatial forward
 * transform) to pin the narrow-row horizontal filter behavior.
 * Build probe_sample with: -Wl,--wrap=QuantizeRow16sTo16s wrap_quant.c */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>

typedef int16_t PIXEL;

void __real_QuantizeRow16sTo16s(PIXEL *input, PIXEL *output, int length,
                                int divisor);

void __wrap_QuantizeRow16sTo16s(PIXEL *input, PIXEL *output, int length,
                                int divisor)
{
    static FILE *log = NULL;
    if (!log) {
        const char *path = getenv("WRAP_QUANT_LOG");
        log = fopen(path ? path : "/tmp/wrap_quant.log", "w");
    }
    if (log && length <= 16) {
        fprintf(log, "len=%d div=%d vals", length, divisor);
        for (int i = 0; i < length; i++)
            fprintf(log, " %d", input[i]);
        fprintf(log, "\n");
        fflush(log);
    }
    __real_QuantizeRow16sTo16s(input, output, length, divisor);
}
