/* Reference SoC firmware main loop (PC-compilable).
 *
 * Implements the chip side of the framed UART protocol that the toolkit's
 * C++ core drives from the PC (SOF 0xAA, STATE=0x01 / GET_SPEC=0x02 /
 * PING=0x03, CRC-8 poly 0x8C, spec payload with 24-byte name tokens, raw
 * little-endian float32 outputs), running any controller that implements
 * the controller_api.h Ops ABI.
 *
 * On hardware this loop runs against the UART driver; on a PC it runs
 * against a serial device or pty passed as argv[1], which lets the whole
 * embedded path be exercised end-to-end without a board:
 *
 *   gcc -O2 -o soc_firmware soc_main.c lqr.c -I. -lm
 *   ./soc_firmware /dev/pts/NN
 */
#include <fcntl.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <termios.h>
#include <unistd.h>

#include "controller_api.h"

#define SOF 0xAA
#define MSG_STATE 0x01
#define MSG_GET_SPEC 0x02
#define MSG_PING 0x03
#define TOKEN_LEN 24
#define MAX_FRAME 256

/* The controller this firmware image hosts.  Override at build time with
 * -DCONTROLLER_OPS=<NAME>_Ops to flash any ControllerOps implementation
 * (e.g. a policy exported by models/export_c.py). */
#ifdef CONTROLLER_OPS
extern const ControllerOps CONTROLLER_OPS;
#else
extern const ControllerOps LQR_Ops;
#define CONTROLLER_OPS LQR_Ops
#endif

static uint8_t crc8(const uint8_t *msg, int len) {
    uint8_t crc = 0;
    for (int i = 0; i < len; ++i) {
        uint8_t val = msg[i];
        for (int b = 0; b < 8; ++b) {
            uint8_t mix = (crc ^ val) & 1u;
            crc >>= 1;
            if (mix) crc ^= 0x8C;
            val >>= 1;
        }
    }
    return crc;
}

static int read_exact(int fd, uint8_t *buf, int n) {
    int got = 0;
    while (got < n) {
        ssize_t r = read(fd, buf + got, (size_t)(n - got));
        if (r <= 0) return got;
        got += (int)r;
    }
    return got;
}

static void write_all(int fd, const uint8_t *buf, int n) {
    int sent = 0;
    while (sent < n) {
        ssize_t w = write(fd, buf + sent, (size_t)(n - sent));
        if (w <= 0) return;
        sent += (int)w;
    }
}

static void send_spec(int fd) {
    const ControllerSpec *spec = CONTROLLER_OPS.spec();
    uint8_t hdr[4] = {(uint8_t)spec->version, (uint8_t)spec->n_inputs,
                      (uint8_t)spec->n_outputs, TOKEN_LEN};
    write_all(fd, hdr, 4);
    for (int i = 0; i < spec->n_inputs; ++i) {
        uint8_t tok[TOKEN_LEN];
        memset(tok, 0, TOKEN_LEN);
        strncpy((char *)tok, spec->names[i], TOKEN_LEN - 1);
        write_all(fd, tok, TOKEN_LEN);
    }
}

int main(int argc, char **argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <serial-device>\n", argv[0]);
        return 2;
    }
    int fd = open(argv[1], O_RDWR | O_NOCTTY);
    if (fd < 0) {
        perror("open");
        return 1;
    }
    struct termios tio;
    if (tcgetattr(fd, &tio) == 0) {
        cfmakeraw(&tio);
        tcsetattr(fd, TCSANOW, &tio);
    }

    if (CONTROLLER_OPS.init) CONTROLLER_OPS.init();
    const ControllerSpec *spec = CONTROLLER_OPS.spec();
    float inputs[CTT_MAX_INPUTS];
    float outputs[CTT_MAX_INPUTS];

    uint8_t frame[MAX_FRAME];
    for (;;) {
        /* Hunt for SOF, then read [type, len]. */
        if (read_exact(fd, frame, 1) != 1) break;
        if (frame[0] != SOF) continue;
        if (read_exact(fd, frame + 1, 2) != 2) break;
        int len = frame[2];
        if (len < 4 || len > MAX_FRAME) continue;
        if (read_exact(fd, frame + 3, len - 3) != len - 3) break;
        if (crc8(frame, len - 1) != frame[len - 1]) continue;

        switch (frame[1]) {
        case MSG_PING: {
            uint8_t pong[4] = {SOF, MSG_PING, 4, 0};
            pong[3] = crc8(pong, 3);
            write_all(fd, pong, 4);
            break;
        }
        case MSG_GET_SPEC:
            send_spec(fd);
            break;
        case MSG_STATE: {
            int n = (len - 4) / 4;
            if (n > spec->n_inputs) n = spec->n_inputs;
            memcpy(inputs, frame + 3, (size_t)n * 4);
            CONTROLLER_OPS.evaluate(inputs, outputs);
            write_all(fd, (const uint8_t *)outputs,
                      spec->n_outputs * 4);
            break;
        }
        default:
            break;
        }
    }
    if (CONTROLLER_OPS.release) CONTROLLER_OPS.release();
    close(fd);
    return 0;
}
