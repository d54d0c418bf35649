"""TTS models: Tacotron2 (AR), FastSpeech2 (non-AR), vocoders."""
