// Native MP4 muxer/encoder for s2v_tpu (reference L0 equivalent of the
// imageio-ffmpeg binary used by diffusers' export_to_video,
// reference utils/export_utils.py:158-186: H.264 yuv420p mp4 at the given
// fps).  Thin C API over libavformat/libavcodec/libswscale, consumed from
// Python via ctypes (s2v_tpu/utils/mp4_native.py).
//
// API (all return 0 / non-NULL on success):
//   void*       s2v_mp4_open(path, width, height, fps, crf)
//   int         s2v_mp4_write_frame(ctx, rgb)   // packed RGB24 [H, W, 3]
//   int         s2v_mp4_close(ctx)              // flush + trailer + free
//   const char* s2v_mp4_last_error()
//
// Width/height must be even (yuv420p chroma subsampling); the Python
// wrapper pads odd sizes before calling.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <cstdio>
#include <cstring>
#include <string>

namespace {

thread_local std::string g_error;

void set_error(const std::string& msg, int averr = 0) {
  if (averr != 0) {
    char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
    av_strerror(averr, buf, sizeof(buf));
    g_error = msg + ": " + buf;
  } else {
    g_error = msg;
  }
}

struct MuxCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* enc = nullptr;
  AVStream* stream = nullptr;
  AVFrame* yuv = nullptr;
  SwsContext* sws = nullptr;
  int width = 0, height = 0;
  int64_t pts = 0;
  bool header_written = false;
};

void free_ctx(MuxCtx* c) {
  if (!c) return;
  if (c->sws) sws_freeContext(c->sws);
  if (c->yuv) av_frame_free(&c->yuv);
  if (c->enc) avcodec_free_context(&c->enc);
  if (c->fmt) {
    if (c->fmt->pb) avio_closep(&c->fmt->pb);
    avformat_free_context(c->fmt);
  }
  delete c;
}

// Drain the encoder into the muxer; pass frame=nullptr to flush.
int encode_and_mux(MuxCtx* c, AVFrame* frame) {
  int ret = avcodec_send_frame(c->enc, frame);
  if (ret < 0) {
    set_error("avcodec_send_frame", ret);
    return -1;
  }
  AVPacket* pkt = av_packet_alloc();
  if (!pkt) {
    set_error("av_packet_alloc failed");
    return -1;
  }
  while (true) {
    ret = avcodec_receive_packet(c->enc, pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) break;
    if (ret < 0) {
      set_error("avcodec_receive_packet", ret);
      av_packet_free(&pkt);
      return -1;
    }
    if (pkt->duration == 0) pkt->duration = 1;  // one frame in enc time_base
    av_packet_rescale_ts(pkt, c->enc->time_base, c->stream->time_base);
    pkt->stream_index = c->stream->index;
    ret = av_interleaved_write_frame(c->fmt, pkt);
    if (ret < 0) {
      set_error("av_interleaved_write_frame", ret);
      av_packet_free(&pkt);
      return -1;
    }
  }
  av_packet_free(&pkt);
  return 0;
}

}  // namespace

extern "C" {

const char* s2v_mp4_last_error() { return g_error.c_str(); }

void* s2v_mp4_open(const char* path, int width, int height, int fps, int crf) {
  if (width <= 0 || height <= 0 || (width % 2) || (height % 2)) {
    set_error("width/height must be positive and even for yuv420p");
    return nullptr;
  }
  if (fps <= 0) fps = 8;
  av_log_set_level(AV_LOG_ERROR);

  MuxCtx* c = new MuxCtx();
  c->width = width;
  c->height = height;

  int ret = avformat_alloc_output_context2(&c->fmt, nullptr, "mp4", path);
  if (ret < 0 || !c->fmt) {
    set_error("avformat_alloc_output_context2", ret);
    free_ctx(c);
    return nullptr;
  }

  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_H264);
  if (!codec) codec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!codec) {
    set_error("no H.264/MPEG-4 encoder in this libavcodec build");
    free_ctx(c);
    return nullptr;
  }

  c->stream = avformat_new_stream(c->fmt, nullptr);
  c->enc = avcodec_alloc_context3(codec);
  if (!c->stream || !c->enc) {
    set_error("stream/codec-context allocation failed");
    free_ctx(c);
    return nullptr;
  }

  c->enc->width = width;
  c->enc->height = height;
  c->enc->pix_fmt = AV_PIX_FMT_YUV420P;
  c->enc->time_base = AVRational{1, fps};
  c->enc->framerate = AVRational{fps, 1};
  c->enc->gop_size = 12;
  if (c->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    c->enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;

  AVDictionary* opts = nullptr;
  if (codec->id == AV_CODEC_ID_H264) {
    char crf_s[16];
    int crf_clamped = crf >= 0 ? (crf > 51 ? 51 : crf) : 23;
    snprintf(crf_s, sizeof(crf_s), "%d", crf_clamped);
    av_dict_set(&opts, "crf", crf_s, 0);
    av_dict_set(&opts, "preset", "medium", 0);
  }
  ret = avcodec_open2(c->enc, codec, &opts);
  av_dict_free(&opts);
  if (ret < 0) {
    set_error("avcodec_open2", ret);
    free_ctx(c);
    return nullptr;
  }

  ret = avcodec_parameters_from_context(c->stream->codecpar, c->enc);
  if (ret < 0) {
    set_error("avcodec_parameters_from_context", ret);
    free_ctx(c);
    return nullptr;
  }
  c->stream->time_base = c->enc->time_base;

  ret = avio_open(&c->fmt->pb, path, AVIO_FLAG_WRITE);
  if (ret < 0) {
    set_error("avio_open", ret);
    free_ctx(c);
    return nullptr;
  }
  ret = avformat_write_header(c->fmt, nullptr);
  if (ret < 0) {
    set_error("avformat_write_header", ret);
    free_ctx(c);
    return nullptr;
  }
  c->header_written = true;

  c->yuv = av_frame_alloc();
  if (!c->yuv) {
    set_error("av_frame_alloc failed");
    free_ctx(c);
    return nullptr;
  }
  c->yuv->format = AV_PIX_FMT_YUV420P;
  c->yuv->width = width;
  c->yuv->height = height;
  if (av_frame_get_buffer(c->yuv, 0) < 0) {
    set_error("av_frame_get_buffer");
    free_ctx(c);
    return nullptr;
  }

  c->sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                          AV_PIX_FMT_YUV420P, SWS_BICUBIC, nullptr, nullptr,
                          nullptr);
  if (!c->sws) {
    set_error("sws_getContext failed");
    free_ctx(c);
    return nullptr;
  }
  return c;
}

int s2v_mp4_write_frame(void* ctx, const unsigned char* rgb) {
  MuxCtx* c = static_cast<MuxCtx*>(ctx);
  if (!c || !rgb) {
    set_error("null ctx/frame");
    return -1;
  }
  if (av_frame_make_writable(c->yuv) < 0) {
    set_error("av_frame_make_writable");
    return -1;
  }
  const uint8_t* src[1] = {rgb};
  const int src_stride[1] = {3 * c->width};
  sws_scale(c->sws, src, src_stride, 0, c->height, c->yuv->data,
            c->yuv->linesize);
  c->yuv->pts = c->pts++;
  return encode_and_mux(c, c->yuv);
}

int s2v_mp4_close(void* ctx) {
  MuxCtx* c = static_cast<MuxCtx*>(ctx);
  if (!c) return -1;
  int rc = 0;
  if (c->header_written) {
    if (encode_and_mux(c, nullptr) < 0) rc = -1;  // flush
    if (av_write_trailer(c->fmt) < 0) {
      set_error("av_write_trailer");
      rc = -1;
    }
  }
  free_ctx(c);
  return rc;
}

}  // extern "C"
