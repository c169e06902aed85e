/* Oracle: run the reference decoder's band entropy stage in isolation.
 *
 *   wrap_band_fsm <payload.bin> <width> <height> <pitch_bytes> <quant> \
 *                 <codeset_index> <difference_coding> <out.bin>
 *
 * Replicates exactly what the entropy worker does per band
 * (`Codec/entropy_threading.c:139-218`): copy the decoder's initialized
 * FSM for the band's codeset, fold the band quantizer into the table
 * (DeQuantFSM), FSM-decode the payload (DecodeBandFSM16sNoGap), then
 * apply the in-place int16 row cumsum when the band was
 * difference-coded.  Dumps the resulting PIXEL (int16 LE) plane so the
 * Python model (entropy/native + ref/gop.frame_wavelet_inverse) can be
 * pinned against the binary band by band.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>

#include "codec.h"
#include "codebooks.h"
#include "bitstream.h"

extern "C" {
bool InitDecoderFSM(DECODER *decoder, CODESET *cs);
void DeQuantFSM(FSM *fsm, int quant);
bool DecodeBandFSM16sNoGap(FSM *fsm, BITSTREAM *stream,
                           PIXEL16S *image, int width, int height,
                           int pitch);
void InitBitstreamBuffer(BITSTREAM *stream, uint8_t *buffer,
                         size_t length, uint32_t access);
}

static DECODER dec;                      /* zeroed static: no allocator */
static BITSTREAM stream;
static FSM fsm;

int main(int argc, char **argv)
{
    if (argc != 9) {
        fprintf(stderr, "usage: %s payload.bin w h pitch_bytes quant "
                        "codeset_idx diff out.bin\n", argv[0]);
        return 2;
    }
    const char *payload_path = argv[1];
    int width = atoi(argv[2]);
    int height = atoi(argv[3]);
    int pitch = atoi(argv[4]);
    int quant = atoi(argv[5]);
    int csidx = atoi(argv[6]);
    int diff = atoi(argv[7]);
    const char *out_path = argv[8];

    static CODESET codesets[CODEC_NUM_CODESETS];
    memcpy(&codesets[0], &CURRENT_CODESET, sizeof(CODESET));
    memcpy(&codesets[1], &SECOND_CODESET, sizeof(CODESET));
    memcpy(&codesets[2], &THIRD_CODESET, sizeof(CODESET));
    if (!InitCodebooks(NULL, codesets)) {   /* NULL allocator -> malloc */
        fprintf(stderr, "InitCodebooks failed\n");
        return 1;
    }
    if (!InitDecoderFSM(&dec, &codesets[0])) {
        fprintf(stderr, "InitDecoderFSM failed\n");
        return 1;
    }

    FILE *f = fopen(payload_path, "rb");
    if (!f) { perror(payload_path); return 1; }
    fseek(f, 0, SEEK_END);
    long n = ftell(f);
    fseek(f, 0, SEEK_SET);
    uint8_t *payload = (uint8_t *)malloc((size_t)n + 16);
    if (fread(payload, 1, (size_t)n, f) != (size_t)n) { return 1; }
    fclose(f);

    PIXEL *plane = (PIXEL *)calloc((size_t)height * (size_t)(pitch / 2),
                                   sizeof(PIXEL));

    memcpy(&fsm, &dec.fsm[csidx], sizeof(FSM));
    DeQuantFSM(&fsm, quant);
    InitBitstreamBuffer(&stream, payload, (size_t)n, BITSTREAM_ACCESS_READ);
    if (!DecodeBandFSM16sNoGap(&fsm, &stream, (PIXEL16S *)plane,
                               width, height, pitch)) {
        fprintf(stderr, "DecodeBandFSM16sNoGap failed\n");
        return 1;
    }

    if (diff) {
        /* `Codec/entropy_threading.c:205`: in-place int16 row cumsum */
        PIXEL *line = plane;
        for (int y = 0; y < height; y++) {
            for (int x = 1; x < width; x++)
                line[x] += line[x - 1];
            line += pitch / 2;
        }
    }

    FILE *o = fopen(out_path, "wb");
    fwrite(plane, sizeof(PIXEL), (size_t)height * (size_t)(pitch / 2), o);
    fclose(o);
    return 0;
}
