/*
 * embed_smoke.c — true-embedding smoke client for libzl.so.
 *
 * Exercises the path the reference's C++/QML host uses: a non-Python process
 * dlopens nothing, links libzl directly, calls initJuce() (which boots the
 * embedded interpreter + engine), drives the clip API, and shuts down.
 * Exit code 0 plus the EMBED-OK line is the pass signal.
 *
 * Build/run: see tests/test_capi.py::test_c_host_embedding.
 */

#include <stdio.h>
#include <string.h>
#include <unistd.h>

#include "libzl.h"

int main(int argc, char **argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: embed_smoke <clip.wav>\n");
    return 2;
  }
  initJuce();

  ClipAudioSource *clip = ClipAudioSource_new(argv[1], false);
  if (clip == NULL) {
    fprintf(stderr, "clip creation failed\n");
    return 1;
  }
  float duration = ClipAudioSource_getDuration(clip);
  if (duration <= 0.0f) {
    fprintf(stderr, "bad duration %f\n", duration);
    return 1;
  }
  int id = ClipAudioSource_id(clip);
  if (ClipAudioSource_byID(id) != clip) {
    fprintf(stderr, "byID mismatch\n");
    return 1;
  }
  ClipAudioSource_setVolume(clip, -6.0f);
  ClipAudioSource_setPan(clip, 0.25f);

  SyncTimer_startTimer(60000 / (120 * 96));
  ClipAudioSource_play(clip, true);
  usleep(300 * 1000); /* let the pump render ~300 ms */
  ClipAudioSource_stop(clip);
  SyncTimer_stopTimer();

  JackPassthrough_setDryAmount(2, 0.5f);
  if (JackPassthrough_getDryAmount(2) != 0.5f) {
    fprintf(stderr, "passthrough roundtrip failed\n");
    return 1;
  }
  float db = dBFromVolume(1.0f);
  if (db > 0.001f || db < -0.001f) {
    fprintf(stderr, "dBFromVolume(1.0) = %f\n", db);
    return 1;
  }

  ClipAudioSource_destroy(clip);
  shutdownJuce();
  printf("EMBED-OK duration=%.3f id=%d\n", duration, id);
  return 0;
}
