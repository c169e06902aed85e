/* Interposition probe: for narrow spatial transforms, dump the two pixels
 * of memory preceding each input row (what the width<=16 scalar tail of
 * FilterHorizontalRow16s actually reads at column 0). */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef int16_t PIXEL;
typedef struct { int width, height; } ROI;

void __real_FilterSpatialQuant16s(PIXEL *input_image, int input_pitch,
    PIXEL *lowlow_band, int lowlow_pitch, PIXEL *lowhigh_band, int lowhigh_pitch,
    PIXEL *highlow_band, int highlow_pitch, PIXEL *highhigh_band, int highhigh_pitch,
    PIXEL *buffer, size_t buffer_size, ROI roi, int quantization[4]);

void __wrap_FilterSpatialQuant16s(PIXEL *input_image, int input_pitch,
    PIXEL *lowlow_band, int lowlow_pitch, PIXEL *lowhigh_band, int lowhigh_pitch,
    PIXEL *highlow_band, int highlow_pitch, PIXEL *highhigh_band, int highhigh_pitch,
    PIXEL *buffer, size_t buffer_size, ROI roi, int quantization[4])
{
    static FILE *log = NULL;
    if (!log) {
        const char *path = getenv("WRAP_SPATIAL_LOG");
        log = fopen(path ? path : "/tmp/wrap_spatial.log", "w");
    }
    if (log) {
        fprintf(log, "call w=%d h=%d pitch=%d img=%p buf=%p q=%d,%d,%d,%d\n",
                roi.width, roi.height, input_pitch, (void *)input_image,
                (void *)buffer, quantization[0], quantization[1],
                quantization[2], quantization[3]);
        for (int r = 0; r < (roi.width <= 16 ? roi.height : 0); r++) {
            PIXEL *row = input_image + (size_t)r * input_pitch / 2;
            fprintf(log, " row%d pre=%d,%d first=%d,%d,%d,%d last=%d,%d\n",
                    r, row[-2], row[-1], row[0], row[1], row[2], row[3],
                    row[roi.width - 2], row[roi.width - 1]);
        }
        fflush(log);
    }
    __real_FilterSpatialQuant16s(input_image, input_pitch,
        lowlow_band, lowlow_pitch, lowhigh_band, lowhigh_pitch,
        highlow_band, highlow_pitch, highhigh_band, highhigh_pitch,
        buffer, buffer_size, roi, quantization);
}
