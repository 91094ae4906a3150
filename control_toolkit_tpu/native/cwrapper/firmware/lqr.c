/* Sample firmware-style C controller: cartpole LQR state feedback.
 *
 * u = -(k_pos*pos + k_posD*posD + k_ang*angle + k_angD*angleD), clamped to
 * [-1, 1].  Gains precomputed offline for the built-in cartpole model.
 */
#include "controller_api.h"

/* Discrete LQR gains for the built-in cartpole at dt=0.02
 * (Q=diag(10,1,100,1), R=10, solved offline via Riccati iteration). */
static const float K_POS = -0.8565f;
static const float K_POSD = -1.0483f;
static const float K_ANG = -6.9523f;
static const float K_ANGD = -1.6711f;

static const ControllerSpec LQR_spec = {
    1, /* version */
    4, /* n_inputs */
    1, /* n_outputs */
    {"position", "positionD", "angle", "angleD"},
};

static void lqr_init(void) {}

static void lqr_evaluate(const float *in, float *out) {
    float u = -(K_POS * in[0] + K_POSD * in[1] + K_ANG * in[2] + K_ANGD * in[3]);
    if (u > 1.0f) u = 1.0f;
    if (u < -1.0f) u = -1.0f;
    out[0] = u;
}

static const ControllerSpec *lqr_spec(void) { return &LQR_spec; }

static void lqr_release(void) {}

const ControllerOps LQR_Ops = {lqr_init, lqr_evaluate, lqr_spec, lqr_release};
