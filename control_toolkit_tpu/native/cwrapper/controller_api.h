/* Controller firmware ABI.
 *
 * The ops-struct contract a C controller implements to run both on the
 * embedded target and on the PC through the runtime-compiled wrapper
 * (capability parity with the ABI the reference drives,
 * /root/reference/Controllers/controller_C.py:151-219: init / evaluate /
 * spec / release around a <NAME>_Ops struct).
 *
 * A controller translation unit defines:
 *
 *   static const ControllerSpec MY_spec = {
 *       .version = 1, .n_inputs = 4, .n_outputs = 1,
 *       .names = {"position", "positionD", "angle", "angleD"},
 *   };
 *   const ControllerOps MYCTRL_Ops = { init_fn, eval_fn, spec_fn, release_fn };
 */
#ifndef CTT_CONTROLLER_API_H
#define CTT_CONTROLLER_API_H

#ifdef __cplusplus
extern "C" {
#endif

#define CTT_MAX_INPUTS 32

typedef struct {
    int version;
    int n_inputs;
    int n_outputs;
    const char *names[CTT_MAX_INPUTS];
} ControllerSpec;

typedef struct {
    /* One-time initialization (optional, may be NULL). */
    void (*init)(void);
    /* Compute outputs from inputs; arrays sized per the spec. */
    void (*evaluate)(const float *inputs, float *outputs);
    /* Static description of the IO contract. */
    const ControllerSpec *(*spec)(void);
    /* Teardown (optional, may be NULL). */
    void (*release)(void);
} ControllerOps;

#ifdef __cplusplus
}
#endif

#endif /* CTT_CONTROLLER_API_H */
