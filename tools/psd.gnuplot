# Render a Bartlett PSD dump produced by `python -m sdr_tpu ... --psd-dump f`
# (the analogue of the reference's data/example.gnuplot over logVector dumps):
#   gnuplot -e "file='psd.dat'" tools/psd.gnuplot > psd.png
set terminal png size 1024,768
set grid
set xlabel 'Frequency (kHz)'
set ylabel 'PSD (dB/Hz)'
set title 'Demodulated IF spectrum (Bartlett estimate)'
if (!exists("file")) file='psd.dat'
plot file using 1:2 with lines lw 2 notitle
