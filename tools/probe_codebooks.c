/* Probe the reference oracle library to dump the exact entropy-coding
 * tables the CFHD encoder uses at runtime (VLE valuebook with fused
 * sign+companding, composite zero-run table, band-end codes).
 *
 * Output is machine-readable; cineform_tpu/spec regenerates the same tables
 * independently and validates against this dump (tools/gen_codebooks.py).
 * Links against the oracle build (.refstub/libCFHDCodec.a); observes
 * behavior only.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "codebooks.h"
#include "vlc.h"
#include "bitstream.h"

extern CODESET cs9, cs17, cs18;

static void dump_codeset(CODESET *cs, const char *name)
{
    printf("CODESET %s flags=0x%x\n", name, cs->flags);

    /* magnitude codebook (static table) */
    {
        VLCBOOK *book = cs->magsbook;
        VLC *code = (VLC *)((char *)book + sizeof(VLCBOOK));
        int i;
        printf("MAGSBOOK %d\n", book->length);
        for (i = 0; i < book->length; i++)
            printf("M %d %d 0x%08X\n", i, code[i].size, code[i].bits);
    }
    /* sparse zero-run codebook (static table) */
    {
        RLCBOOK *book = cs->zerobook;
        RLE *code = (RLE *)((char *)book + sizeof(RLCBOOK));
        int i;
        printf("ZEROBOOK %d\n", book->length);
        for (i = 0; i < book->length; i++)
            printf("Z %d %d 0x%08X %d\n", i, code[i].size, code[i].bits, code[i].count);
    }
    /* decode RLV codebook (static table) */
    {
        RLVBOOK *book = cs->runsbook;
        RLV *code = (RLV *)((char *)book + sizeof(RLVBOOK));
        int i;
        printf("RUNSBOOK %d\n", book->length);
        for (i = 0; i < book->length; i++)
            printf("R %d %d 0x%08X %d %d\n", i, code[i].size, code[i].bits,
                   code[i].count, code[i].value);
    }
    /* band-end code from the tags book */
    {
        unsigned int *tags = cs->tagsbook;
        int pos = tags[0] - 1;
        printf("BANDEND size=%u bits=0x%08X\n", tags[pos*2+1], tags[pos*2+2]);
    }
    /* computed valuebook (VLE, fused sign+companding) */
    {
        VALBOOK *book = cs->valuebook;
        VLE *tbl = (VLE *)((char *)book + sizeof(VALBOOK));
        int i;
        printf("VALUEBOOK %d %d\n", book->size, book->length);
        for (i = 0; i < book->length; i++) {
            unsigned int e = tbl[i].entry;
            printf("V %d %u 0x%08X\n", i, e >> 27, e & 0x7FFFFFF);
        }
    }
    /* computed composite run-length table */
    {
        RLCBOOK *book = cs->codebook_runbook;
        RLC *tbl = (RLC *)((char *)book + sizeof(RLCBOOK));
        int i;
        printf("RUNBOOK %d\n", book->length);
        for (i = 0; i < book->length; i++)
            printf("C %d %d %d 0x%08X\n", i, tbl[i].size, tbl[i].count, tbl[i].bits);
    }
}

/* Behavioral check: PutVlcByte + PutZeroRun bit output for sample values */
static void probe_putvlc(CODESET *cs, const char *name)
{
    static uint8_t buffer[65536];
    int testvals[] = {1, -1, 2, -2, 5, -5, 40, -40, 100, -100, 255, -255,
                      256, -256, 300, -300, 1000, -1000, 1023, -1023,
                      1024, -1024, 2000, -2000, 5000, -5000, 32767, -32768};
    int i, n = sizeof(testvals)/sizeof(testvals[0]);
    printf("PUTVLC %s\n", name);
    for (i = 0; i < n; i++) {
        BITSTREAM bs;
        int nbytes, j;
        InitBitstream(&bs);
        SetBitstreamBuffer(&bs, buffer, sizeof(buffer), BITSTREAM_ACCESS_WRITE);
        PutVlcByte(&bs, testvals[i], cs->valuebook);
        /* flush: pad to byte boundary by writing zero bits via FlushStream */
        printf("P %d : nbits_used=%d buf=", testvals[i],
               (int)(32 - bs.nBitsFree));
        /* print the pending bit buffer left-aligned */
        printf("0x%08X", bs.nBitsFree < 32 ? (bs.wBuffer << bs.nBitsFree) : 0);
        nbytes = bs.nWordsUsed;
        printf(" words=");
        for (j = 0; j < nbytes && j < 8; j++) printf("%02X", buffer[j]);
        printf("\n");
    }
}

int main(void)
{
    static CODESET codesets[3];
    memcpy(&codesets[0], &cs9, sizeof(CODESET));
    memcpy(&codesets[1], &cs17, sizeof(CODESET));
    memcpy(&codesets[2], &cs18, sizeof(CODESET));
    if (!InitCodebooks(NULL, &codesets[0])) {
        fprintf(stderr, "InitCodebooks failed\n");
        return 1;
    }
    dump_codeset(&codesets[0], "cs9");
    dump_codeset(&codesets[1], "cs17");
    dump_codeset(&codesets[2], "cs18");
    probe_putvlc(&codesets[1], "cs17");
    return 0;
}
