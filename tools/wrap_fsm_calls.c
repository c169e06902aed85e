/* Interposition probe: log every band FSM decode call the reference
 * decoder makes (function variant, dimensions, and the first decoded
 * row after the call) to identify which decode path each band takes.
 *
 * Link with:
 *   -Wl,--wrap=DecodeBandFSM16sNoGap
 *   -Wl,--wrap=DecodeBandFSM16sNoGap2Pass
 *   -Wl,--wrap=DecodeBandFSM16sNoGapWithPeaks
 */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>

typedef int16_t PIXEL16S;
typedef struct fsm FSM;        /* opaque here */
typedef struct bitstream BITSTREAM;

#ifdef __cplusplus
extern "C" {
#endif

static FILE *fsm_logfile(void)
{
    static FILE *log = NULL;
    if (!log) {
        const char *path = getenv("WRAP_FSM_LOG");
        log = fopen(path ? path : "/tmp/wrap_fsm.log", "w");
    }
    return log;
}

int __real_DecodeBandFSM16sNoGap(FSM *fsm, BITSTREAM *stream,
                                 PIXEL16S *image, int width, int height,
                                 int pitch);
int __wrap_DecodeBandFSM16sNoGap(FSM *fsm, BITSTREAM *stream,
                                 PIXEL16S *image, int width, int height,
                                 int pitch)
{
    int r = __real_DecodeBandFSM16sNoGap(fsm, stream, image, width,
                                         height, pitch);
    FILE *log = fsm_logfile();
    if (log) {
        fprintf(log, "NoGap w=%d h=%d pitch=%d row0=%d,%d,%d,%d\n",
                width, height, pitch, image[0], image[1], image[2],
                image[3]);
        fflush(log);
    }
    return r;
}

int __real_DecodeBandFSM16sNoGap2Pass(FSM *fsm, BITSTREAM *stream,
                                      PIXEL16S *image, int width,
                                      int height, int pitch, int quant);
int __wrap_DecodeBandFSM16sNoGap2Pass(FSM *fsm, BITSTREAM *stream,
                                      PIXEL16S *image, int width,
                                      int height, int pitch, int quant)
{
    int r = __real_DecodeBandFSM16sNoGap2Pass(fsm, stream, image, width,
                                              height, pitch, quant);
    FILE *log = fsm_logfile();
    if (log) {
        fprintf(log, "2Pass w=%d h=%d pitch=%d quant=%d row0=%d,%d,%d,%d\n",
                width, height, pitch, quant, image[0], image[1], image[2],
                image[3]);
        fflush(log);
    }
    return r;
}

int __real_DecodeBandFSM16sNoGapWithPeaks(FSM *fsm, BITSTREAM *stream,
                                          PIXEL16S *image, int width,
                                          int height, int pitch,
                                          PIXEL16S *peaks, int level,
                                          int quant);
int __wrap_DecodeBandFSM16sNoGapWithPeaks(FSM *fsm, BITSTREAM *stream,
                                          PIXEL16S *image, int width,
                                          int height, int pitch,
                                          PIXEL16S *peaks, int level,
                                          int quant)
{
    int r = __real_DecodeBandFSM16sNoGapWithPeaks(fsm, stream, image,
                                                  width, height, pitch,
                                                  peaks, level, quant);
    FILE *log = fsm_logfile();
    if (log) {
        fprintf(log, "WithPeaks w=%d h=%d pitch=%d level=%d\n",
                width, height, pitch, level);
        fflush(log);
    }
    return r;
}

#ifdef __cplusplus
}
#endif
