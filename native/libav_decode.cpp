// Universal audio import/export via the system FFmpeg *libraries*.
//
// The reference decodes "any FFmpeg-readable file" by linking libavformat/
// libavcodec/libswresample directly (/root/reference/app.cpp:12-17,
// 624-741): open + probe, first audio stream, decode, swr_convert to float
// at the file's own rate (no rate conversion), append.  This shim is the
// same capability with the modern (FFmpeg 5.x) API — send_packet/
// receive_frame instead of the deprecated avcodec_decode_audio4, and the
// intended resize==memcpy behavior (the reference's resize(nb_samples) vs
// memcpy(frame_count) mismatch at app.cpp:725-727 is a known quirk,
// SURVEY.md §2).
//
// Unlike the reference we keep the channel count (downmix happens in
// Python so `mono=False` stereo sessions work) and expose a streaming
// handle instead of one monolithic decode, so Python can grow its buffer
// exactly (VBR duration estimates lie).
//
// Built as a SEPARATE shared object (libmelonix_av.so): the core runtime
// (libmelonix_native.so) must keep loading on machines without libav.
//
// C ABI:
//   void*     mlxav_open(const char* path)            NULL on failure
//   int       mlxav_rate(void*)
//   int       mlxav_channels(void*)
//   long long mlxav_read(void*, float* out, long long max_frames)
//             -> interleaved frames written; 0 = EOF; <0 = error
//   void      mlxav_close(void*)
//   const char* mlxav_last_error()                    thread-local message
//   int       mlxav_encode(path, float* interleaved, long long frames,
//                          int rate, int channels)    0 ok / <0 error
//             (codec + container guessed from the extension — the
//              fixture/export tool; AAC-in-MP4, Opus, Vorbis, ...)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_err;

void set_err(const char* what, int averr = 0) {
  char buf[256] = {0};
  if (averr != 0) av_strerror(averr, buf, sizeof(buf));
  g_err = std::string(what) + (averr ? std::string(": ") + buf : std::string());
}

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_index = -1;
  int rate = 0;
  int channels = 0;
  bool eof_sent = false;       // packets exhausted, decoder flushing
  bool done = false;           // decoder fully drained
  std::vector<float> backlog;  // decoded interleaved frames not yet consumed
  size_t backlog_pos = 0;      // floats already handed out
};

void free_decoder(Decoder* d) {
  if (!d) return;
  if (d->swr) swr_free(&d->swr);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->frame) av_frame_free(&d->frame);
  delete d;
}

// Convert one decoded frame through swr into d->backlog (interleaved f32,
// at the stream's native rate — swr only does format/layout conversion
// here, mirroring out_sample_rate = in rate, app.cpp:678-680).
bool push_frame(Decoder* d, const AVFrame* f) {
  const int max_out = swr_get_out_samples(d->swr, f ? f->nb_samples : 0);
  if (max_out <= 0) return true;
  const size_t base = d->backlog.size();
  d->backlog.resize(base + size_t(max_out) * d->channels);
  uint8_t* out_planes[1] = {
      reinterpret_cast<uint8_t*>(d->backlog.data() + base)};
  const int got = swr_convert(d->swr, out_planes, max_out,
                              f ? const_cast<const uint8_t**>(f->extended_data)
                                : nullptr,
                              f ? f->nb_samples : 0);
  if (got < 0) {
    set_err("swr_convert", got);
    return false;
  }
  d->backlog.resize(base + size_t(got) * d->channels);
  return true;
}

// Pump packets until at least one more decoded frame lands in the backlog
// or the stream ends.  Returns false on hard error.
bool pump(Decoder* d) {
  while (!d->done) {
    int ret = avcodec_receive_frame(d->codec, d->frame);
    if (ret == 0) {
      bool ok = push_frame(d, d->frame);
      av_frame_unref(d->frame);
      return ok;
    }
    if (ret == AVERROR_EOF) {
      // Drain swr's own delay buffer once the decoder is dry.
      if (!push_frame(d, nullptr)) return false;
      d->done = true;
      return true;
    }
    if (ret != AVERROR(EAGAIN)) {
      set_err("avcodec_receive_frame", ret);
      return false;
    }
    // Decoder wants input.
    if (d->eof_sent) continue;  // flush in progress; loop back to receive
    ret = av_read_frame(d->fmt, d->pkt);
    if (ret == AVERROR_EOF) {
      avcodec_send_packet(d->codec, nullptr);
      d->eof_sent = true;
      continue;
    }
    if (ret < 0) {
      set_err("av_read_frame", ret);
      return false;
    }
    if (d->pkt->stream_index == d->stream_index) {
      // Errors here mean a corrupt packet: skip it and keep decoding
      // (fail-soft; the reference LOGs and continues, app.cpp:707-713).
      (void)avcodec_send_packet(d->codec, d->pkt);
    }
    av_packet_unref(d->pkt);
  }
  return true;
}

}  // namespace

extern "C" {

const char* mlxav_last_error() { return g_err.c_str(); }

void* mlxav_open(const char* path) {
  av_log_set_level(AV_LOG_ERROR);
  Decoder* d = new Decoder();
  int ret = avformat_open_input(&d->fmt, path, nullptr, nullptr);
  if (ret < 0) {
    set_err("avformat_open_input", ret);
    free_decoder(d);
    return nullptr;
  }
  ret = avformat_find_stream_info(d->fmt, nullptr);
  if (ret < 0) {
    set_err("avformat_find_stream_info", ret);
    free_decoder(d);
    return nullptr;
  }
  // First audio stream (app.cpp:640-653 picks the first CODEC_TYPE_AUDIO).
  const AVCodec* dec = nullptr;
  ret = av_find_best_stream(d->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
  if (ret < 0 || !dec) {
    set_err("no audio stream", ret < 0 ? ret : AVERROR_DECODER_NOT_FOUND);
    free_decoder(d);
    return nullptr;
  }
  d->stream_index = ret;
  AVStream* st = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(dec);
  if (!d->codec ||
      avcodec_parameters_to_context(d->codec, st->codecpar) < 0 ||
      (ret = avcodec_open2(d->codec, dec, nullptr)) < 0) {
    set_err("avcodec_open2", ret);
    free_decoder(d);
    return nullptr;
  }
  d->rate = d->codec->sample_rate;
  d->channels = d->codec->ch_layout.nb_channels;
  if (d->rate <= 0 || d->channels <= 0) {
    set_err("bad stream parameters");
    free_decoder(d);
    return nullptr;
  }
  // swr: native layout/format -> interleaved f32 at the SAME rate
  // (no rate conversion, app.cpp:678-680).
  AVChannelLayout in_layout;
  if (d->codec->ch_layout.order == AV_CHANNEL_ORDER_UNSPEC)
    av_channel_layout_default(&in_layout, d->channels);
  else
    av_channel_layout_copy(&in_layout, &d->codec->ch_layout);
  ret = swr_alloc_set_opts2(&d->swr, &in_layout, AV_SAMPLE_FMT_FLT, d->rate,
                            &in_layout, d->codec->sample_fmt, d->rate, 0,
                            nullptr);
  av_channel_layout_uninit(&in_layout);
  if (ret < 0 || (ret = swr_init(d->swr)) < 0) {
    set_err("swr_init", ret);
    free_decoder(d);
    return nullptr;
  }
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  if (!d->pkt || !d->frame) {
    set_err("alloc");
    free_decoder(d);
    return nullptr;
  }
  return d;
}

int mlxav_rate(void* h) { return h ? static_cast<Decoder*>(h)->rate : 0; }
int mlxav_channels(void* h) {
  return h ? static_cast<Decoder*>(h)->channels : 0;
}

long long mlxav_read(void* h, float* out, long long max_frames) {
  if (!h || max_frames < 0) return -1;
  Decoder* d = static_cast<Decoder*>(h);
  const size_t want = size_t(max_frames) * d->channels;
  size_t have = d->backlog.size() - d->backlog_pos;
  while (have < want && !d->done) {
    if (!pump(d)) return -1;
    have = d->backlog.size() - d->backlog_pos;
  }
  const size_t n = have < want ? have : want;
  std::memcpy(out, d->backlog.data() + d->backlog_pos, n * sizeof(float));
  d->backlog_pos += n;
  if (d->backlog_pos == d->backlog.size()) {
    d->backlog.clear();
    d->backlog_pos = 0;
  }
  return (long long)(n / d->channels);
}

void mlxav_close(void* h) { free_decoder(static_cast<Decoder*>(h)); }

// ---------------------------------------------------------------------
// Encode: float32 interleaved -> container/codec guessed from extension.
// Export capability + the fixture generator for the import tests (the
// reference only exports WAV; AAC/Opus/Vorbis export is an added
// capability row, PARITY.md).
int mlxav_encode(const char* path, const float* pcm, long long frames,
                 int rate, int channels) {
  av_log_set_level(AV_LOG_ERROR);
  AVFormatContext* fmt = nullptr;
  int ret = avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (ret < 0 || !fmt) {
    set_err("avformat_alloc_output_context2", ret);
    return -1;
  }
  int rc = -1;
  AVCodecContext* enc = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  uint8_t** conv = nullptr;  // whole-track converted sample planes
  do {
    const AVCodec* codec =
        avcodec_find_encoder(fmt->oformat->audio_codec);
    if (!codec) {
      set_err("no encoder for container");
      break;
    }
    AVStream* st = avformat_new_stream(fmt, nullptr);
    enc = avcodec_alloc_context3(codec);
    if (!st || !enc) {
      set_err("alloc stream");
      break;
    }
    // Restricted-rate encoders (Opus: the 48k family only) get the
    // nearest supported rate; swr below resamples to it.
    int enc_rate = rate;
    if (codec->supported_samplerates) {
      int best = 0;
      for (const int* p = codec->supported_samplerates; *p; ++p) {
        if (*p == rate) { best = rate; break; }
        if (best == 0 || llabs((long long)*p - rate) <
                             llabs((long long)best - rate))
          best = *p;
      }
      if (best) enc_rate = best;
    }
    enc->sample_rate = enc_rate;
    av_channel_layout_default(&enc->ch_layout, channels);
    enc->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0]
                                         : AV_SAMPLE_FMT_FLTP;
    enc->bit_rate = 128000LL * channels;
    enc->time_base = {1, enc_rate};
    // FFmpeg's native Opus/Vorbis encoders are gated as experimental.
    enc->strict_std_compliance = FF_COMPLIANCE_EXPERIMENTAL;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if ((ret = avcodec_open2(enc, codec, nullptr)) < 0) {
      set_err("avcodec_open2(enc)", ret);
      break;
    }
    if ((ret = avcodec_parameters_from_context(st->codecpar, enc)) < 0) {
      set_err("params_from_context", ret);
      break;
    }
    st->time_base = enc->time_base;
    if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
        (ret = avio_open(&fmt->pb, path, AVIO_FLAG_WRITE)) < 0) {
      set_err("avio_open", ret);
      break;
    }
    if ((ret = avformat_write_header(fmt, nullptr)) < 0) {
      set_err("write_header", ret);
      break;
    }
    // Pre-convert the whole track (format + rate) into encoder-native
    // planes, then slice fixed frames out of it — keeps the frame loop
    // trivial even when swr resamples.
    AVChannelLayout lay;
    av_channel_layout_default(&lay, channels);
    ret = swr_alloc_set_opts2(&swr, &lay, enc->sample_fmt, enc_rate, &lay,
                              AV_SAMPLE_FMT_FLT, rate, 0, nullptr);
    av_channel_layout_uninit(&lay);
    if (ret < 0 || (ret = swr_init(swr)) < 0) {
      set_err("swr_init(enc)", ret);
      break;
    }
    const int64_t max_out =
        av_rescale_rnd(frames + 4096, enc_rate, rate, AV_ROUND_UP);
    int linesize = 0;
    if ((ret = av_samples_alloc_array_and_samples(
             &conv, &linesize, channels, (int)max_out, enc->sample_fmt,
             0)) < 0) {
      set_err("samples_alloc", ret);
      break;
    }
    const uint8_t* in_planes[1] = {
        reinterpret_cast<const uint8_t*>(pcm)};
    int got = swr_convert(swr, conv, (int)max_out, in_planes, (int)frames);
    if (got >= 0) {
      // Drain swr's resampler delay.
      uint8_t* tail[AV_NUM_DATA_POINTERS] = {nullptr};
      const int nplanes =
          av_sample_fmt_is_planar(enc->sample_fmt) ? channels : 1;
      for (int c = 0; c < nplanes; ++c)
        tail[c] = conv[c] + (size_t)got * av_get_bytes_per_sample(
                                              enc->sample_fmt) *
                                (nplanes == 1 ? channels : 1);
      const int extra =
          swr_convert(swr, tail, (int)(max_out - got), nullptr, 0);
      if (extra > 0) got += extra;
    }
    if (got < 0) {
      set_err("swr_convert(enc)", got);
      break;
    }
    pkt = av_packet_alloc();
    frame = av_frame_alloc();
    if (!pkt || !frame) {
      set_err("alloc");
      break;
    }
    const int fsz = enc->frame_size > 0 ? enc->frame_size : 1024;
    int64_t pts = 0;
    bool failed = false;
    auto drain_packets = [&](const char* what) -> bool {
      int r2;
      while ((r2 = avcodec_receive_packet(enc, pkt)) == 0) {
        av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
        pkt->stream_index = st->index;
        const int wr = av_interleaved_write_frame(fmt, pkt);
        if (wr < 0) {
          set_err(what, wr);
          return false;
        }
      }
      if (r2 != AVERROR(EAGAIN) && r2 != AVERROR_EOF) {
        set_err("receive_packet", r2);
        return false;
      }
      return true;
    };
    for (int64_t pos = 0; pos < got || pos == 0; pos += fsz) {
      const int n = (int)(got - pos < fsz ? got - pos : fsz);
      frame->nb_samples = fsz;
      frame->format = enc->sample_fmt;
      av_channel_layout_copy(&frame->ch_layout, &enc->ch_layout);
      if ((ret = av_frame_get_buffer(frame, 0)) < 0) {
        set_err("frame_get_buffer", ret);
        failed = true;
        break;
      }
      if ((ret = av_samples_set_silence(frame->extended_data, 0, fsz,
                                        channels, enc->sample_fmt)) < 0 ||
          (n > 0 &&
           (ret = av_samples_copy(frame->extended_data, conv, 0, (int)pos,
                                  n, channels, enc->sample_fmt)) < 0)) {
        set_err("samples_copy", ret);
        failed = true;
        break;
      }
      frame->pts = pts;
      pts += fsz;
      if ((ret = avcodec_send_frame(enc, frame)) < 0) {
        set_err("send_frame", ret);
        failed = true;
        break;
      }
      if (!drain_packets("write_frame")) {
        failed = true;
        break;
      }
      av_frame_unref(frame);
    }
    if (failed) break;
    if ((ret = avcodec_send_frame(enc, nullptr)) < 0 &&
        ret != AVERROR_EOF) {
      set_err("send_frame(flush)", ret);
      break;
    }
    if (!drain_packets("write_frame(flush)")) break;
    if ((ret = av_write_trailer(fmt)) < 0) {
      set_err("write_trailer", ret);
      break;
    }
    rc = 0;
  } while (false);
  if (conv) {
    if (conv[0]) av_freep(&conv[0]);
    av_freep(&conv);
  }
  if (swr) swr_free(&swr);
  if (enc) avcodec_free_context(&enc);
  if (pkt) av_packet_free(&pkt);
  if (frame) av_frame_free(&frame);
  if (fmt) {
    if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb)
      avio_closep(&fmt->pb);
    avformat_free_context(fmt);
  }
  return rc;
}

}  // extern "C"
